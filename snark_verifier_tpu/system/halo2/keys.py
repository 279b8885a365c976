"""ProvingKey (de)serialization — SDK key management parity.

The reference SDK persists pk/vk via halo2's `ProvingKey::write/read`
(snark-verifier-sdk/src/lib.rs:127-224): the serialized artifact carries
the preprocessed material (fixed/permutation polynomials), while the
circuit's synthesize logic is re-supplied at read time.  Same contract
here: `pk_to_json` captures everything in the ProvingKey except the
`synthesize` closure; `pk_from_json(obj, srs, synthesize)` rebuilds it.
The protocol rides along via verifier/plonk/serialization.py (the same
serde-shaped layout the golden fixture pins).
"""

from __future__ import annotations

import json

from snark_verifier_tpu.system.halo2.circuits import (
    LookupInfo,
    PermutationInfo,
    ProvingKey,
)
from snark_verifier_tpu.verifier.plonk.serialization import (
    _expr_from_json,
    _expr_to_json,
    protocol_from_json,
    protocol_to_json,
)


def pk_to_json(pk: ProvingKey) -> dict:
    perm = pk.permutation
    return {
        "protocol": protocol_to_json(pk.protocol),
        "fixed_values": {
            str(idx): [hex(v) for v in vals] for idx, vals in pk.fixed_values.items()
        },
        "permutation": (
            None
            if perm is None
            else {
                "columns": perm.columns,
                "sigma_polys": perm.sigma_polys,
                "chunk": perm.chunk,
                "delta": hex(perm.delta),
            }
        ),
        "advice_phases": pk.advice_phases,
        "z_polys": pk.z_polys,
        "instance_polys": pk.instance_polys,
        "extended_k": pk.extended_k,
        "coset_gen": hex(pk.coset_gen),
        "zk_blinding": getattr(pk, "zk_blinding", 0),
        "random_poly": getattr(pk, "random_poly", None),
        "lookups": (
            None
            if not pk.lookups
            else [
                {
                    "input_exprs": [_expr_to_json(e) for e in lk.input_exprs],
                    "table_exprs": [_expr_to_json(e) for e in lk.table_exprs],
                    "permuted_input_poly": lk.permuted_input_poly,
                    "permuted_table_poly": lk.permuted_table_poly,
                    "z_poly": lk.z_poly,
                    "theta_challenge": lk.theta_challenge,
                }
                for lk in pk.lookups
            ]
        ),
    }


def pk_from_json(obj: dict, srs, synthesize) -> ProvingKey:
    protocol = protocol_from_json(obj["protocol"])
    perm = obj["permutation"]
    lookups = obj.get("lookups")
    return ProvingKey(
        protocol=protocol,
        srs=srs,
        fixed_values={
            int(idx): [int(v, 16) for v in vals]
            for idx, vals in obj["fixed_values"].items()
        },
        permutation=(
            None
            if perm is None
            else PermutationInfo(
                columns=list(perm["columns"]),
                sigma_polys=list(perm["sigma_polys"]),
                chunk=perm["chunk"],
                delta=int(perm["delta"], 16),
            )
        ),
        advice_phases=[list(p) for p in obj["advice_phases"]],
        z_polys=list(obj["z_polys"]),
        instance_polys=list(obj["instance_polys"]),
        synthesize=synthesize,
        extended_k=obj["extended_k"],
        coset_gen=int(obj["coset_gen"], 16),
        zk_blinding=obj.get("zk_blinding", 0),
        random_poly=obj.get("random_poly"),
        lookups=(
            None
            if not lookups
            else [
                LookupInfo(
                    input_exprs=[_expr_from_json(e) for e in lk["input_exprs"]],
                    table_exprs=[_expr_from_json(e) for e in lk["table_exprs"]],
                    permuted_input_poly=lk["permuted_input_poly"],
                    permuted_table_poly=lk["permuted_table_poly"],
                    z_poly=lk["z_poly"],
                    theta_challenge=lk["theta_challenge"],
                )
                for lk in lookups
            ]
        ),
    )


def save_pk(pk: ProvingKey, path: str):
    with open(path, "w") as f:
        json.dump(pk_to_json(pk), f)


def load_pk(path: str, srs, synthesize) -> ProvingKey:
    with open(path) as f:
        return pk_from_json(json.load(f), srs, synthesize)
