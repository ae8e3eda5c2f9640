"""Native (C++) host components, compiled lazily with g++ and bound via
ctypes — the same deployment pattern the reference uses for its ASE D3
CUDA library (``sevenn/calculator.py:317-380``: torch cpp_extension JIT).

Currently: the cell-list neighbor list (``nl.cpp``), ~100x faster than
the scipy KD-tree path at 100k atoms. Falls back silently when no
compiler is available (callers keep the pure-numpy path).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

__all__ = ["native_neighbor_list", "native_available"]

_LIB = None
_TRIED = False


def _build_lib() -> Optional[ctypes.CDLL]:
    src = os.path.join(os.path.dirname(__file__), "nl.cpp")
    with open(src, "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:12]
    cache = os.environ.get(
        "SEVENN_TPU_NATIVE_CACHE",
        os.path.expanduser("~/.cache/sevennet_tpu"),
    )
    os.makedirs(cache, exist_ok=True)
    lib_path = os.path.join(cache, f"libnl_{tag}.so")
    if not os.path.exists(lib_path):
        tmp = lib_path + f".build{os.getpid()}"
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC",
            "-std=c++17", src, "-o", tmp,
        ]
        try:
            subprocess.run(
                cmd, check=True, capture_output=True, timeout=120
            )
            os.replace(tmp, lib_path)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError:
        return None
    P = ctypes.POINTER
    lib.nl_build.restype = ctypes.c_int64
    lib.nl_build.argtypes = [
        P(ctypes.c_double), ctypes.c_int64, P(ctypes.c_double),
        P(ctypes.c_int), ctypes.c_double,
    ]
    lib.nl_dst_ptr.restype = P(ctypes.c_int64)
    lib.nl_src_ptr.restype = P(ctypes.c_int64)
    lib.nl_shift_ptr.restype = P(ctypes.c_double)
    lib.nl_release.restype = None
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        if not int(os.environ.get("SEVENN_TPU_DISABLE_NATIVE", 0)):
            _LIB = _build_lib()
    return _LIB


def native_available() -> bool:
    return _get_lib() is not None


def native_neighbor_list(
    positions: np.ndarray,
    cutoff: float,
    cell: np.ndarray,
    pbc,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """C++ cell-list full neighbor list; returns (dst, src, shifts) with
    matscipy 'ijDS' semantics, or None when the native path cannot serve
    this system (no compiler, or a periodic height < cutoff that needs
    more than one image — the numpy path handles those).

    The returned arrays are ZERO-COPY views over library-owned memory and
    stay valid until the NEXT native_neighbor_list call (copying 300 MB
    out at 100k atoms costs more than the whole search under this
    sandbox's page-fault rates; every in-repo caller consumes the result
    immediately). Call ``np.array(...)`` on them if you must hold them."""
    lib = _get_lib()
    if lib is None:
        return None
    pos = np.ascontiguousarray(positions, np.float64)
    n = len(pos)
    cellm = np.ascontiguousarray(cell, np.float64).reshape(9)
    pbc_arr = np.ascontiguousarray(
        [int(bool(b)) for b in pbc], np.int32
    )
    P = ctypes.POINTER
    total = lib.nl_build(
        pos.ctypes.data_as(P(ctypes.c_double)),
        ctypes.c_int64(n),
        cellm.ctypes.data_as(P(ctypes.c_double)),
        pbc_arr.ctypes.data_as(P(ctypes.c_int)),
        ctypes.c_double(float(cutoff)),
    )
    if total < 0:
        return None
    if total == 0:
        return (
            np.zeros(0, np.int64), np.zeros(0, np.int64),
            np.zeros((0, 3), np.float64),
        )
    dst = np.ctypeslib.as_array(lib.nl_dst_ptr(), shape=(total,))
    src = np.ctypeslib.as_array(lib.nl_src_ptr(), shape=(total,))
    shift = np.ctypeslib.as_array(lib.nl_shift_ptr(), shape=(total, 3))
    return dst, src, shift
