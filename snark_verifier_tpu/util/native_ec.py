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
                tmp = f"{so}.tmp.{os.getpid()}"
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-o", tmp, src],
                    check=True,
                    capture_output=True,
                )
                os.replace(tmp, so)  # atomic: concurrent builders never
                # leave a half-written .so for another process to dlopen
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


# ---------------------------------------------------------------------------
# v2: threaded vector/MSM kernels (Montgomery numpy buffers end-to-end).
# Bound lazily on first use; see native/bn254_native.cpp "v2" section.
# ---------------------------------------------------------------------------

_V2_SIGS = {
    "fr_vec_to_mont": ("ppn", None),
    "fr_vec_from_mont": ("ppn", None),
    "fr_vec_add": ("pppn", None),
    "fr_vec_sub": ("pppn", None),
    "fr_vec_mul": ("pppn", None),
    "fr_vec_scale": ("pppn", None),
    "fr_vec_add_scaled": ("ppppn", None),
    "fr_vec_inv": ("ppn", None),
    "fr_vec_prefix_prod": ("ppn", None),
    "fr_vec_pow_series": ("ppn", None),
    "bn254_fr_ntt_mont": ("pUpp", None),
    "bn254_g1_to_mont_affine": ("ppn", None),
    "bn254_g1_from_mont_affine": ("ppn", None),
    "bn254_msm2": ("ppnp", None),
    "bn254_srs_gen": ("pnp", None),
    "fr_vec_horner": ("ppnp", None),
    "fr_vec_div_linear": ("pppnp", None),
}

_v2_bound = False


def _bind_v2(lib):
    global _v2_bound
    if _v2_bound:
        return
    P64 = ctypes.POINTER(ctypes.c_uint64)
    codes = {"p": P64, "n": ctypes.c_size_t, "U": ctypes.c_uint64}
    for name, (argcode, res) in _V2_SIGS.items():
        fn = getattr(lib, name)
        fn.argtypes = [codes[c] for c in argcode]
        fn.restype = res
    _v2_bound = True


def lib_v2():
    """The loaded library with v2 entry points bound; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    _bind_v2(lib)
    return lib


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def msm2(scalars_u64: np.ndarray, points_mont: np.ndarray):
    """MSM over pre-converted buffers: scalars (n,4) canonical u64, points
    (n,8) Montgomery affine.  Returns a canonical affine int pair or None."""
    lib = lib_v2()
    n = scalars_u64.shape[0]
    assert points_mont.shape[0] >= n
    out = np.zeros(12, np.uint64)
    lib.bn254_msm2(_ptr(scalars_u64), _ptr(points_mont), n, _ptr(out))
    x = sum(int(out[i]) << (64 * i) for i in range(4))
    y = sum(int(out[4 + i]) << (64 * i) for i in range(4))
    z = sum(int(out[8 + i]) << (64 * i) for i in range(4))
    return bn254._from_jac((x, y, z) if z else None)


def g1_to_mont(points) -> np.ndarray:
    """Affine int pairs/None -> (n,8) Montgomery u64 array."""
    n = len(points)
    arr = np.zeros((n, 8), np.uint64)
    for i, pt in enumerate(points):
        if pt is not None:
            arr[i, :4] = _to_u64_limbs(pt[0])
            arr[i, 4:] = _to_u64_limbs(pt[1])
    lib = lib_v2()
    lib.bn254_g1_to_mont_affine(_ptr(arr), _ptr(arr), n)
    return arr


def g1_from_mont(arr: np.ndarray) -> list:
    """(n,8) Montgomery u64 array -> affine int pairs/None."""
    n = arr.shape[0]
    out = np.empty_like(arr)
    lib = lib_v2()
    lib.bn254_g1_from_mont_affine(_ptr(out), _ptr(arr), n)
    raw = out.tobytes()
    pts = []
    for i in range(n):
        x = int.from_bytes(raw[64 * i : 64 * i + 32], "little")
        y = int.from_bytes(raw[64 * i + 32 : 64 * i + 64], "little")
        pts.append(None if x == 0 and y == 0 else (x, y))
    return pts


def srs_gen_mont(tau: int, n: int) -> np.ndarray:
    """Native SRS generation: (n,8) Montgomery affine points tau^i * G."""
    lib = lib_v2()
    if lib is None:
        raise RuntimeError("native bn254 library unavailable")
    out = np.zeros((n, 8), np.uint64)
    t = _quad(tau % bn254.R)
    lib.bn254_srs_gen(_ptr(t), n, _ptr(out))
    return out
