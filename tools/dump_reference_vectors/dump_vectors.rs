//! Reference-vector dump tool for the snark_verifier_tpu interop pack.
//!
//! This file is NOT built in this repository (no Rust toolchain in the TPU
//! build environment).  To produce the fixtures, on any machine with Rust
//! 1.75+ and network access:
//!
//!   git clone https://github.com/privacy-scaling-explorations/snark-verifier
//!   cp tools/dump_reference_vectors/dump_vectors.rs \
//!      snark-verifier/snark-verifier-sdk/examples/dump_vectors.rs
//!   cd snark-verifier && cargo run --release -p snark-verifier-sdk \
//!      --example dump_vectors -- /path/to/out_dir
//!
//! then copy the emitted *.json into `tests/golden/reference/` of this repo
//! and run `python -m pytest tests/test_reference_interop.py -v` — the
//! xfail interop tests activate automatically when the fixtures exist.
//!
//! Emits:
//!   poseidon_t5.json      PSE poseidon-crate Spec (T=5, RATE=4, R_F=8,
//!                         R_P=60): dense MDS, pre-sparse MDS, sparse
//!                         matrices, optimized round constants
//!                         (start/partial/end), plus end-to-end sponge
//!                         vectors (inputs -> squeeze) through the
//!                         reference's own Poseidon hasher
//!                         (snark-verifier/src/util/hash/poseidon.rs).
//!   protocol_standard_plonk_k9.json
//!                         serde-JSON PlonkProtocol from compile()
//!                         (system/halo2.rs:95-182) for StandardPlonk k=9
//!                         (the test circuit of test/circuit/standard.rs).
//!   srs_k9.json           svk (g[0]), g[1], g2, s_g2 coordinates.
//!   proof_k9_{gwc,shplonk}_{poseidon,keccak}.json
//!                         proof bytes + instances + the expected succinct
//!                         accumulator (lhs, rhs) computed by the
//!                         reference's own PlonkSuccinctVerifier
//!                         (deterministic ChaCha20Rng seed, matching
//!                         system/halo2/test.rs:191).
//!
//! All field elements are 0x-prefixed BIG-endian hex strings.

use halo2_proofs::{
    circuit::{floor_planner::V1, Layouter, Value},
    halo2curves::bn256::{Bn256, Fq, Fr, G1Affine, G2Affine},
    plonk::{
        create_proof, keygen_pk, keygen_vk, Advice, Circuit, Column, ConstraintSystem, Error,
        Fixed, Instance,
    },
    poly::{
        commitment::ParamsProver,
        kzg::{
            commitment::{KZGCommitmentScheme, ParamsKZG},
            multiopen::{ProverGWC, ProverSHPLONK},
        },
        Rotation,
    },
    transcript::TranscriptWriterBuffer,
};
use itertools::Itertools;
use rand_chacha::{rand_core::SeedableRng, ChaCha20Rng};
use serde_json::json;
use snark_verifier::{
    loader::native::NativeLoader,
    pcs::kzg::KzgSuccinctVerifyingKey,
    system::halo2::{compile, transcript::evm::EvmTranscript, Config},
    util::arithmetic::PrimeField,
    util::hash::Poseidon,
    verifier::SnarkVerifier,
};
use snark_verifier_sdk::{
    halo2::{PoseidonTranscript, POSEIDON_SPEC},
    PlonkSuccinctVerifier, GWC, SHPLONK,
};
use std::{env, fs, path::PathBuf};

const K: u32 = 9;

fn fe_hex<F: PrimeField<Repr = [u8; 32]>>(f: &F) -> String {
    let mut b = f.to_repr();
    b.reverse();
    format!("0x{}", hex::encode(b))
}

fn g1_json(p: &G1Affine) -> serde_json::Value {
    json!({"x": fe_hex(&p.x), "y": fe_hex(&p.y)})
}

fn g2_json(p: &G2Affine) -> serde_json::Value {
    json!({
        "x": [fe_hex(&p.x.c0), fe_hex(&p.x.c1)],
        "y": [fe_hex(&p.y.c0), fe_hex(&p.y.c1)],
    })
}

// ---------------------------------------------------------------------------
// StandardPlonk test circuit — same shape as the reference's test fixture
// (snark-verifier/src/system/halo2/test/circuit/standard.rs:10-124), which
// is #[cfg(test)]-gated and therefore re-stated here for the example.
// ---------------------------------------------------------------------------

#[derive(Clone)]
struct StandardPlonkConfig {
    a: Column<Advice>,
    b: Column<Advice>,
    c: Column<Advice>,
    q_a: Column<Fixed>,
    q_b: Column<Fixed>,
    q_c: Column<Fixed>,
    q_ab: Column<Fixed>,
    constant: Column<Fixed>,
    #[allow(dead_code)]
    instance: Column<Instance>,
}

impl StandardPlonkConfig {
    fn configure(meta: &mut ConstraintSystem<Fr>) -> Self {
        let [a, b, c] = [(); 3].map(|_| meta.advice_column());
        let [q_a, q_b, q_c, q_ab, constant] = [(); 5].map(|_| meta.fixed_column());
        let instance = meta.instance_column();

        [a, b, c].map(|column| meta.enable_equality(column));

        meta.create_gate("", |meta| {
            let [a, b, c] = [a, b, c].map(|column| meta.query_advice(column, Rotation::cur()));
            let [q_a, q_b, q_c, q_ab, constant] = [q_a, q_b, q_c, q_ab, constant]
                .map(|column| meta.query_fixed(column, Rotation::cur()));
            let instance = meta.query_instance(instance, Rotation::cur());
            Some(q_a * a.clone() + q_b * b.clone() + q_c * c + q_ab * a * b + constant + instance)
        });

        StandardPlonkConfig { a, b, c, q_a, q_b, q_c, q_ab, constant, instance }
    }
}

#[derive(Clone, Default)]
struct StandardPlonk(Fr);

impl StandardPlonk {
    fn instances(&self) -> Vec<Vec<Fr>> {
        vec![vec![self.0]]
    }
}

impl Circuit<Fr> for StandardPlonk {
    type Config = StandardPlonkConfig;
    type FloorPlanner = V1;
    #[cfg(feature = "halo2_circuit_params")]
    type Params = ();

    fn without_witnesses(&self) -> Self {
        Self::default()
    }

    fn configure(meta: &mut ConstraintSystem<Fr>) -> Self::Config {
        meta.set_minimum_degree(4);
        StandardPlonkConfig::configure(meta)
    }

    fn synthesize(
        &self,
        config: Self::Config,
        mut layouter: impl Layouter<Fr>,
    ) -> Result<(), Error> {
        layouter.assign_region(
            || "",
            |mut region| {
                region.assign_advice(|| "", config.a, 0, || Value::known(self.0))?;
                region.assign_fixed(|| "", config.q_a, 0, || Value::known(-Fr::one()))?;

                region.assign_advice(|| "", config.a, 1, || Value::known(-Fr::from(5)))?;
                for (column, idx) in [config.q_a, config.q_b, config.q_c, config.q_ab, config.constant]
                    .iter()
                    .zip(1..)
                {
                    region.assign_fixed(|| "", *column, 1, || Value::known(Fr::from(idx)))?;
                }

                let a = region.assign_advice(|| "", config.a, 2, || Value::known(Fr::one()))?;
                a.copy_advice(|| "", &mut region, config.b, 3)?;
                a.copy_advice(|| "", &mut region, config.c, 4)?;

                Ok(())
            },
        )
    }
}

// ---------------------------------------------------------------------------

fn dump_poseidon(out: &PathBuf) {
    let spec = POSEIDON_SPEC.clone();
    let mds = spec.mds_matrices().mds().rows();
    let pre_sparse = spec.mds_matrices().pre_sparse_mds().rows();
    let sparse = spec
        .mds_matrices()
        .sparse_matrices()
        .iter()
        .map(|m| {
            json!({
                "row": m.row().iter().map(fe_hex).collect_vec(),
                "col_hat": m.col_hat().iter().map(fe_hex).collect_vec(),
            })
        })
        .collect_vec();
    let rows = |rows: &[[Fr; 5]]| {
        rows.iter()
            .map(|r| r.iter().map(fe_hex).collect_vec())
            .collect_vec()
    };

    // end-to-end sponge vectors through the reference's own hasher
    let loader = NativeLoader;
    let mut vectors = vec![];
    for n in 0..10usize {
        let inputs = (0..n).map(|i| Fr::from(1_000 + i as u64)).collect_vec();
        let mut hasher = Poseidon::<Fr, Fr, 5, 4>::from_spec(&loader, POSEIDON_SPEC.clone());
        hasher.update(&inputs);
        let squeeze = hasher.squeeze();
        vectors.push(json!({
            "inputs": inputs.iter().map(fe_hex).collect_vec(),
            "squeeze": fe_hex(&squeeze),
        }));
    }
    // stateful multi-squeeze sequence (update 3, squeeze, update 5, squeeze)
    {
        let mut hasher = Poseidon::<Fr, Fr, 5, 4>::from_spec(&loader, POSEIDON_SPEC.clone());
        let in1 = (0..3u64).map(Fr::from).collect_vec();
        hasher.update(&in1);
        let s1 = hasher.squeeze();
        let in2 = (10..15u64).map(Fr::from).collect_vec();
        hasher.update(&in2);
        let s2 = hasher.squeeze();
        vectors.push(json!({
            "inputs": in1.iter().map(fe_hex).collect_vec(),
            "squeeze": fe_hex(&s1),
            "then_inputs": in2.iter().map(fe_hex).collect_vec(),
            "then_squeeze": fe_hex(&s2),
        }));
    }

    let doc = json!({
        "t": 5, "rate": 4, "r_f": 8, "r_p": 60,
        "mds": rows(&mds),
        "pre_sparse_mds": rows(&pre_sparse),
        "sparse": sparse,
        "constants_start": rows(spec.constants().start()),
        "constants_partial": spec.constants().partial().iter().map(fe_hex).collect_vec(),
        "constants_end": rows(spec.constants().end()),
        "sponge_vectors": vectors,
    });
    fs::write(out.join("poseidon_t5.json"), serde_json::to_string_pretty(&doc).unwrap()).unwrap();
}

fn main() {
    let out = PathBuf::from(env::args().nth(1).unwrap_or_else(|| "reference_vectors".into()));
    fs::create_dir_all(&out).unwrap();

    dump_poseidon(&out);

    // deterministic SRS + keys, matching system/halo2/test.rs:23-38 seeding
    let params = ParamsKZG::<Bn256>::setup(K, ChaCha20Rng::from_seed(Default::default()));
    let circuit = StandardPlonk(Fr::from(31415u64)); // fixed witness
    let vk = keygen_vk(&params, &circuit).unwrap();
    let pk = keygen_pk(&params, vk, &circuit).unwrap();
    let protocol = compile(&params, pk.get_vk(), Config::kzg().with_num_instance(vec![1]));
    fs::write(
        out.join("protocol_standard_plonk_k9.json"),
        serde_json::to_string_pretty(&protocol).unwrap(),
    )
    .unwrap();

    fs::write(
        out.join("srs_k9.json"),
        serde_json::to_string_pretty(&json!({
            "k": K,
            "g0": g1_json(&params.get_g()[0]),
            "g1": g1_json(&params.get_g()[1]),
            "g2": g2_json(&params.g2()),
            "s_g2": g2_json(&params.s_g2()),
        }))
        .unwrap(),
    )
    .unwrap();

    let svk: KzgSuccinctVerifyingKey<G1Affine> = params.get_g()[0].into();
    let instances = circuit.instances();
    let instances_slice = instances.iter().map(Vec::as_slice).collect_vec();

    for scheme in ["gwc", "shplonk"] {
        for transcript_kind in ["poseidon", "keccak"] {
            // prove with a deterministic rng (test.rs:191)
            let rng = ChaCha20Rng::from_seed(Default::default());
            let proof = match transcript_kind {
                "poseidon" => {
                    let mut transcript = PoseidonTranscript::<NativeLoader, Vec<u8>>::from_spec(
                        vec![],
                        POSEIDON_SPEC.clone(),
                    );
                    match scheme {
                        "gwc" => create_proof::<KZGCommitmentScheme<Bn256>, ProverGWC<_>, _, _, _, _>(
                            &params, &pk, &[circuit.clone()], &[&instances_slice], rng, &mut transcript,
                        )
                        .unwrap(),
                        _ => create_proof::<KZGCommitmentScheme<Bn256>, ProverSHPLONK<_>, _, _, _, _>(
                            &params, &pk, &[circuit.clone()], &[&instances_slice], rng, &mut transcript,
                        )
                        .unwrap(),
                    };
                    transcript.finalize()
                }
                _ => {
                    let mut transcript =
                        TranscriptWriterBuffer::<_, G1Affine, _>::init(Vec::new());
                    match scheme {
                        "gwc" => create_proof::<KZGCommitmentScheme<Bn256>, ProverGWC<_>, _, _, EvmTranscript<_, _, _, _>, _>(
                            &params, &pk, &[circuit.clone()], &[&instances_slice], rng, &mut transcript,
                        )
                        .unwrap(),
                        _ => create_proof::<KZGCommitmentScheme<Bn256>, ProverSHPLONK<_>, _, _, EvmTranscript<_, _, _, _>, _>(
                            &params, &pk, &[circuit.clone()], &[&instances_slice], rng, &mut transcript,
                        )
                        .unwrap(),
                    };
                    transcript.finalize()
                }
            };

            // reference-side succinct verify -> expected accumulator
            let accumulator = {
                macro_rules! run {
                    ($as:ty, $transcript:expr) => {{
                        let mut t = $transcript;
                        let proof_read = PlonkSuccinctVerifier::<$as>::read_proof(
                            &svk, &protocol, &instances, &mut t,
                        )
                        .unwrap();
                        PlonkSuccinctVerifier::<$as>::verify(&svk, &protocol, &instances, &proof_read)
                            .unwrap()
                    }};
                }
                let accs = match (scheme, transcript_kind) {
                    ("gwc", "poseidon") => run!(
                        GWC,
                        PoseidonTranscript::<NativeLoader, &[u8]>::from_spec(
                            proof.as_slice(),
                            POSEIDON_SPEC.clone()
                        )
                    ),
                    ("shplonk", "poseidon") => run!(
                        SHPLONK,
                        PoseidonTranscript::<NativeLoader, &[u8]>::from_spec(
                            proof.as_slice(),
                            POSEIDON_SPEC.clone()
                        )
                    ),
                    ("gwc", _) => run!(
                        GWC,
                        EvmTranscript::<G1Affine, NativeLoader, _, _>::new(proof.as_slice())
                    ),
                    _ => run!(
                        SHPLONK,
                        EvmTranscript::<G1Affine, NativeLoader, _, _>::new(proof.as_slice())
                    ),
                };
                assert_eq!(accs.len(), 1);
                json!({"lhs": g1_json(&accs[0].lhs), "rhs": g1_json(&accs[0].rhs)})
            };

            let doc = json!({
                "k": K,
                "scheme": scheme,
                "transcript": transcript_kind,
                "num_instance": [1],
                "instances": [[fe_hex(&instances[0][0])]],
                "proof_hex": hex::encode(&proof),
                "accumulator": accumulator,
            });
            fs::write(
                out.join(format!("proof_k9_{scheme}_{transcript_kind}.json")),
                serde_json::to_string_pretty(&doc).unwrap(),
            )
            .unwrap();
            println!("dumped proof_k9_{scheme}_{transcript_kind}.json");
        }
    }
    let _ = Fq::zero(); // silence unused-import lint paths on some toolchains
    println!("all vectors written to {}", out.display());
}
