"""ctypes wrapper for the native exact caller engine (native/pecall.c)."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRCS = [os.path.join(_HERE, "native", "pecall.c"),
         os.path.join(_HERE, "native", "rowfmt.c")]
_LIB = None
_KEEPALIVE = []


def _lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    h = hashlib.sha256()
    for src in _SRCS:
        with open(src, "rb") as f:
            h.update(f.read())
    digest = h.hexdigest()[:16]
    cache = os.path.join(tempfile.gettempdir(),
                         f"pecaller_pecall_{digest}.so")
    if not os.path.exists(cache):
        tmp = cache + f".build{os.getpid()}"
        subprocess.run(["gcc", "-O3", "-Wall", "-shared", "-fPIC", "-o",
                        tmp, *_SRCS, "-lpthread", "-lm"],
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
    lib.format_base_rows.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_char), ctypes.c_int64]
    lib.format_base_rows.restype = ctypes.c_int64
    _LIB = lib
    return lib


def format_base_rows(frag: bytes, pos, refc, calls, active) -> bytes:
    """C-speed bulk formatting of .base rows whose posteriors are all
    exactly 1 (screen-resolved sites).  pos i64, refc u8, calls (n,I)
    i8, active (n,I) u8 -> row bytes (each row starts with '\\n')."""
    lib = _lib()
    n, indiv = calls.shape
    pos = np.ascontiguousarray(pos, dtype=np.int64)
    refc = np.ascontiguousarray(refc, dtype=np.uint8)
    calls = np.ascontiguousarray(calls, dtype=np.int8)
    active = np.ascontiguousarray(active, dtype=np.uint8)
    cap = int(n * (24 + len(frag) + 4 * indiv) + 16)
    buf = ctypes.create_string_buffer(cap)
    i64p = ctypes.POINTER(ctypes.c_int64)
    wrote = lib.format_base_rows(
        frag, len(frag),
        pos.ctypes.data_as(i64p),
        refc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        calls.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        active.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, indiv, buf, cap)
    if wrote < 0:
        raise RuntimeError("format_base_rows buffer overflow")
    return buf.raw[:wrote]


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
