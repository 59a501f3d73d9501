"""ctypes wrapper for the native exact caller engine (native/pecall.c)."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_HERE, "native", "pecall.c")
_LIB = None
_KEEPALIVE = []


def _lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.path.join(tempfile.gettempdir(),
                         f"pecaller_pecall_{digest}.so")
    if not os.path.exists(cache):
        tmp = cache + f".build{os.getpid()}"
        subprocess.run(["gcc", "-O3", "-Wall", "-shared", "-fPIC", "-o",
                        tmp, _SRC, "-lpthread", "-lm"],
                       check=True, capture_output=True)
        os.replace(tmp, cache)
    lib = ctypes.CDLL(cache)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.pecall_model_create.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_int, i32p, i32p, i32p]
    lib.pecall_model_create.restype = ctypes.c_void_p
    lib.pecall_model_destroy.argtypes = [ctypes.c_void_p]
    lib.pecall_sites_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_uint8), i32p, i32p,
        ctypes.POINTER(ctypes.c_uint8)]
    lib.pecall_sites_batch.restype = None
    _LIB = lib
    return lib


def load_pecall(indiv, haploid, theta, denovo_rate, threshold, use_ped,
                dad, mom, sex):
    lib = _lib()
    dad = np.ascontiguousarray(dad, dtype=np.int32)
    mom = np.ascontiguousarray(mom, dtype=np.int32)
    sex = np.ascontiguousarray(sex, dtype=np.int32)
    _KEEPALIVE.extend([dad, mom, sex])
    i32p = ctypes.POINTER(ctypes.c_int32)
    model = lib.pecall_model_create(
        indiv, 1 if haploid else 0, theta, denovo_rate, threshold,
        1 if use_ped else 0,
        dad.ctypes.data_as(i32p), mom.ctypes.data_as(i32p),
        sex.ctypes.data_as(i32p))
    return lib, model
