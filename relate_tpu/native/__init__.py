"""Native IO runtime (C++/zlib), loaded via ctypes.

Compiled on first use with the system compiler; all consumers fall back to
the pure-Python implementations when the shared library is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

_SRC = os.path.join(os.path.dirname(__file__), "relate_io.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_relate_io.so")
_lib = None
_tried = False


def _build() -> bool:
    cxx = os.environ.get("CXX", "g++")
    cmd = [cxx, "-O2", "-shared", "-fPIC", "-pthread", "-o", _SO, _SRC,
           "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first use; None if the
    toolchain/zlib is unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_SO) or \
            os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.rt_count_sample.argtypes = [ctypes.c_char_p]
    lib.rt_count_sample.restype = ctypes.c_int
    lib.rt_count_lines.argtypes = [ctypes.c_char_p]
    lib.rt_count_lines.restype = ctypes.c_long
    lib.rt_read_haps.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_char_p, ctypes.c_int]
    lib.rt_read_haps.restype = ctypes.c_long
    lib.rt_write_anc_trees.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    lib.rt_write_anc_trees.restype = ctypes.c_int
    _lib = lib
    return _lib


def read_haps_native(haps_path: str, sample_path: str):
    """Native .haps/.sample parser; returns a HapsData or None."""
    import numpy as np
    from ..io.haps import HapsData

    lib = get_lib()
    if lib is None:
        return None
    N = lib.rt_count_sample(sample_path.encode())
    L = lib.rt_count_lines(haps_path.encode())
    if N <= 0 or L <= 0:
        return None
    G = np.empty((L, N), dtype=np.uint8)
    bp = np.empty(L, dtype=np.int64)
    STR = 192
    meta = np.zeros(L * STR, dtype=np.uint8)
    got = lib.rt_read_haps(
        haps_path.encode(), N, L,
        G.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        bp.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        meta.ctypes.data_as(ctypes.c_char_p), STR)
    if got != L:
        return None
    rsid, anc, alt, chrom = [], [], [], []
    mv = meta.tobytes()
    for i in range(L):
        row = mv[i * STR:(i + 1) * STR]
        f1, _, rest = row.partition(b"\0")
        f2, _, rest = rest.partition(b"\0")
        f3, _, _ = rest.partition(b"\0")
        rsid.append(f1.decode())
        anc.append(f2.decode())
        alt.append(f3.decode())
        chrom.append("1")
    return HapsData(genotypes=G, bp=bp, rsid=rsid, ancestral=anc,
                    alternative=alt, chrom=chrom)


def write_anc_trees_native(path: str, header: str, pos, parents, bl, ne,
                           sb, se) -> bool:
    """Native .anc tree-line writer (appends); False if unavailable."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return False
    T, Mn = parents.shape
    pos = np.ascontiguousarray(pos, dtype=np.int32)
    parents = np.ascontiguousarray(parents, dtype=np.int32)
    bl = np.ascontiguousarray(bl, dtype=np.float64)
    ne = np.ascontiguousarray(ne, dtype=np.float32)
    sb = np.ascontiguousarray(sb, dtype=np.int32)
    se = np.ascontiguousarray(se, dtype=np.int32)
    r = lib.rt_write_anc_trees(
        path.encode(), header.encode(), T, Mn,
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        parents.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        bl.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ne.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        se.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return r == 0
