"""Keccak-256: oracle vs hashlib (via SHA3 padding) and JAX vs oracle."""

import hashlib
import random

import numpy as np
import jax.numpy as jnp

from snark_verifier_tpu.ops import keccak as K
from snark_verifier_tpu.util import keccak as ok

rng = random.Random(11)


def test_oracle_keccak_f_matches_hashlib_sha3():
    for n in [0, 1, 7, 8, 135, 136, 137, 300]:
        data = bytes(rng.randrange(256) for _ in range(n))
        assert ok.sha3_256(data) == hashlib.sha3_256(data).digest()


def test_oracle_keccak256_known_vector():
    # the canonical Ethereum empty-string hash
    assert (
        ok.keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )


def test_jax_keccak256_matches_oracle():
    for n in [0, 1, 32, 135, 136, 137, 272, 500]:
        batch = 3
        msgs = [bytes(rng.randrange(256) for _ in range(n)) for _ in range(batch)]
        arr = jnp.asarray(
            np.array([[b for b in m] for m in msgs], np.uint32).reshape(batch, n)
        )
        got = np.asarray(K.keccak256(arr, n))
        for i, m in enumerate(msgs):
            assert bytes(got[i].astype(np.uint8).tolist()) == ok.keccak256(m)


def test_jax_keccak256_multidim_batch():
    n = 64
    msgs = np.random.default_rng(0).integers(0, 256, size=(2, 2, n), dtype=np.uint32)
    got = np.asarray(K.keccak256(jnp.asarray(msgs), n))
    for i in range(2):
        for j in range(2):
            exp = ok.keccak256(bytes(msgs[i, j].astype(np.uint8).tolist()))
            assert bytes(got[i, j].astype(np.uint8).tolist()) == exp
