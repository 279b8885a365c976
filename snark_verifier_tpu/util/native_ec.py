"""ctypes bindings for the native (C++) host BN254 library.

Builds native/bn254_native.cpp on demand with g++ (cached .so); the host
prover and oracle MSM route through it when available, with the pure-python
implementation kept as the oracle-of-record (cross-checked in tests).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from snark_verifier_tpu.util import bn254

_SRC = os.path.join(os.path.dirname(__file__), "../../native/bn254_native.cpp")
_SO = os.path.join(
    os.environ.get("PARAMS_DIR", os.path.join(os.path.dirname(__file__), "../../testdata/cache")),
    "bn254_native.so",
)

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            src = os.path.abspath(_SRC)
            so = os.path.abspath(_SO)
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                os.makedirs(os.path.dirname(so), exist_ok=True)
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", so, src],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(so)
            lib.bn254_msm.argtypes = [
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_uint64),
            ]
            lib.bn254_msm.restype = None
            lib.bn254_fr_ntt.argtypes = [
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint64),
            ]
            lib.bn254_fr_ntt.restype = None
            lib.bn254_fr_powmul.argtypes = [
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_uint64),
            ]
            lib.bn254_fr_powmul.restype = None
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def _to_u64_limbs(value: int) -> list:
    return [(value >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(4)]


def msm(scalars, points):
    """Native Pippenger MSM; scalars ints, points affine int pairs/None.

    Returns an affine int pair or None.  Raises RuntimeError if the native
    library is unavailable (callers fall back to the python path).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native bn254 library unavailable")
    n = len(scalars)
    s_arr = np.zeros((n, 4), np.uint64)
    p_arr = np.zeros((n, 8), np.uint64)
    for i, (s, pt) in enumerate(zip(scalars, points)):
        s_arr[i] = _to_u64_limbs(s % bn254.R)
        if pt is not None:
            p_arr[i, :4] = _to_u64_limbs(pt[0])
            p_arr[i, 4:] = _to_u64_limbs(pt[1])
    out = np.zeros(12, np.uint64)
    lib.bn254_msm(
        s_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        p_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    x = sum(int(out[i]) << (64 * i) for i in range(4))
    y = sum(int(out[4 + i]) << (64 * i) for i in range(4))
    z = sum(int(out[8 + i]) << (64 * i) for i in range(4))
    return bn254._from_jac((x, y, z) if z else None)


def _ints_to_u64(values) -> np.ndarray:
    buf = b"".join(int(v).to_bytes(32, "little") for v in values)
    return np.frombuffer(buf, np.uint64).reshape(len(values), 4).copy()


def _u64_to_ints(arr: np.ndarray) -> list:
    raw = arr.tobytes()
    return [
        int.from_bytes(raw[32 * i : 32 * (i + 1)], "little")
        for i in range(arr.shape[0])
    ]


def _quad(value: int) -> np.ndarray:
    return np.frombuffer(int(value).to_bytes(32, "little"), np.uint64).copy()


def fr_ntt(values, omega: int, scale: int = 1) -> list:
    """Native in-place radix-2 NTT over Fr; values/omega/scale canonical
    ints; the caller passes omega^-1 and n^-1 as scale for the inverse."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native bn254 library unavailable")
    n = len(values)
    assert n & (n - 1) == 0 and n > 0
    arr = _ints_to_u64(values)
    om = _quad(omega)
    sc = _quad(scale)
    lib.bn254_fr_ntt(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.c_uint64(n.bit_length() - 1),
        om.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        sc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    return _u64_to_ints(arr)


def fr_powmul(values, base: int) -> list:
    """Native element-wise values[i] * base^i (coset scaling)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native bn254 library unavailable")
    arr = _ints_to_u64(values)
    b = _quad(base)
    lib.bn254_fr_powmul(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.c_uint64(len(values)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    return _u64_to_ints(arr)
