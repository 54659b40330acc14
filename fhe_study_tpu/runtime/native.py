"""ctypes bridge to the native golden-model library (native/golden.cpp).

Compiled on demand with g++ (cached in _build/); returns None gracefully when
no toolchain is available so pure-Python environments still work.
"""

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "golden.cpp")
_SO = os.path.join(_ROOT, "_build", "libgolden.so")


@lru_cache(maxsize=1)
def _lib():
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        os.makedirs(os.path.dirname(_SO), exist_ok=True)
        try:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    lib = ctypes.CDLL(_SO)
    lib.golden_mulmod.restype = ctypes.c_uint64
    lib.golden_mulmod.argtypes = [ctypes.c_uint64] * 3
    lib.golden_powmod.restype = ctypes.c_uint64
    lib.golden_powmod.argtypes = [ctypes.c_uint64] * 3
    lib.golden_invmod.restype = ctypes.c_uint64
    lib.golden_invmod.argtypes = [ctypes.c_uint64] * 2
    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.golden_ntt.argtypes = [u64p, ctypes.c_uint64, ctypes.c_uint64,
                               ctypes.c_int]
    lib.golden_polymul_mod.argtypes = [u64p, u64p, u64p, ctypes.c_uint64,
                                       ctypes.c_uint64]
    lib.golden_polymul_torus.argtypes = [u64p, u64p, u64p, ctypes.c_uint64]
    lib.golden_polymul_i64.argtypes = [i64p, i64p, i64p, ctypes.c_uint64]
    return lib


def available() -> bool:
    return _lib() is not None


def mulmod(a: int, b: int, q: int) -> int:
    return int(_lib().golden_mulmod(a, b, q))


def ntt(x, q: int, inverse: bool = False):
    data = np.ascontiguousarray(np.asarray(x, np.uint64).copy())
    assert data.ndim == 1
    _lib().golden_ntt(data, data.shape[0], q, int(inverse))
    return data


def polymul_mod(a, b, q: int):
    a = np.ascontiguousarray(np.asarray(a, np.uint64))
    b = np.ascontiguousarray(np.asarray(b, np.uint64))
    out = np.zeros_like(a)
    _lib().golden_polymul_mod(a, b, out, a.shape[0], q)
    return out


def polymul_torus(a, b):
    a = np.ascontiguousarray(np.asarray(a, np.uint64))
    b = np.ascontiguousarray(np.asarray(b, np.uint64))
    out = np.zeros_like(a)
    _lib().golden_polymul_torus(a, b, out, a.shape[0])
    return out


def polymul_i64(a, b):
    a = np.ascontiguousarray(np.asarray(a, np.int64))
    b = np.ascontiguousarray(np.asarray(b, np.int64))
    out = np.zeros_like(a)
    _lib().golden_polymul_i64(a, b, out, a.shape[0])
    return out
