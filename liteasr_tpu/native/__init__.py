"""ctypes bindings to the C++ host kernels (liteasr_native.cc).

Built on demand with g++ (the image has no pybind11; plain C ABI + ctypes).
Every consumer falls back to the pure-Python implementation when the
toolchain or the .so is unavailable.
"""

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "liteasr_native.cc")
_SO = os.path.join(_DIR, "_liteasr_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
             "-o", _SO],
            check=True, capture_output=True)
        return True
    except (OSError, subprocess.CalledProcessError) as e:
        logger.debug("native build failed: %s", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    lib.levenshtein_u32.restype = ctypes.c_int
    lib.levenshtein_u32.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int]
    lib.levenshtein_batch_u32.restype = None
    lib.levenshtein_batch_u32.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
    lib.kaldi_fm_shape.restype = ctypes.c_int
    lib.kaldi_fm_shape.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    lib.kaldi_fm_read.restype = ctypes.c_int
    lib.kaldi_fm_read.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    _lib = lib
    return _lib


def _as_u32(seq) -> np.ndarray:
    if isinstance(seq, str):
        return np.frombuffer(seq.encode("utf-32-le"), dtype=np.uint32).copy()
    return np.asarray(list(seq), dtype=np.uint32)


def levenshtein(a, b) -> Optional[int]:
    """Native edit distance; None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    ua, ub = _as_u32(a), _as_u32(b)
    pa = ua.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
    pb = ub.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
    return int(lib.levenshtein_u32(pa, len(ua), pb, len(ub)))


def load_fm(path: str, offset: int) -> Optional[np.ndarray]:
    """Native binary float-matrix read; None on any failure (fallback)."""
    lib = get_lib()
    if lib is None:
        return None
    rows = ctypes.c_int32()
    cols = ctypes.c_int32()
    rc = lib.kaldi_fm_shape(path.encode(), offset,
                            ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        return None
    out = np.empty((rows.value, cols.value), dtype=np.float32)
    rc = lib.kaldi_fm_read(
        path.encode(), offset,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size)
    if rc != 0:
        return None
    return out
