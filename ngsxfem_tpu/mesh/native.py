"""ctypes bindings for the native topology library (native/topology.cpp).

Builds the shared library on first use (g++, cached next to the source);
falls back to pure numpy/python implementations when no compiler is present.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    src = os.path.join(root, "native", "topology.cpp")
    so = os.path.join(root, "native", "libngsxtopo.so")
    try:
        # a shipped prebuilt .so without the source must still load
        need_build = not os.path.exists(so) or (
            os.path.exists(src)
            and os.path.getmtime(so) < os.path.getmtime(src))
        if need_build:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", src, "-o", so],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.build_facets.restype = ctypes.c_int64
        lib.build_facets.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.dedup_rows.restype = ctypes.c_int64
        lib.dedup_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.dedup_i64.restype = ctypes.c_int64
        lib.dedup_i64.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def build_facets(elements: np.ndarray, facet_loc: np.ndarray):
    """Native facet dedup; returns (facets, el2facet, facet2el, facet2elloc)
    or None if the native library is unavailable."""
    lib = _lib()
    if lib is None:
        return None
    elements = np.ascontiguousarray(elements, dtype=np.int32)
    facet_loc = np.ascontiguousarray(facet_loc, dtype=np.int32)
    ne, nvel = elements.shape
    nfel, nvf = facet_loc.shape
    el2facet = np.empty((ne, nfel), dtype=np.int32)
    facets = np.empty((ne * nfel, nvf), dtype=np.int32)
    facet2el = np.empty((ne * nfel, 2), dtype=np.int32)
    facet2elloc = np.empty((ne * nfel, 2), dtype=np.int32)
    nf = lib.build_facets(
        elements.ctypes.data, ne, nvel, facet_loc.ctypes.data, nfel, nvf,
        el2facet.ctypes.data, facets.ctypes.data, facet2el.ctypes.data,
        facet2elloc.ctypes.data,
    )
    if nf < 0:
        return None
    return (
        facets[:nf].copy(), el2facet, facet2el[:nf].copy(),
        facet2elloc[:nf].copy(),
    )


def dedup_rows(keys: np.ndarray):
    """Native row dedup for dof fingerprints; returns (ndof, inv, first) or
    None if unavailable."""
    lib = _lib()
    if lib is None:
        return None
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    n, klen = keys.shape
    inv = np.empty(n, dtype=np.int32)
    first = np.empty(n, dtype=np.int64)
    if klen == 1:
        ndof = lib.dedup_i64(keys.ctypes.data, n, inv.ctypes.data,
                             first.ctypes.data)
    else:
        ndof = lib.dedup_rows(keys.ctypes.data, n, klen, inv.ctypes.data,
                              first.ctypes.data)
    if ndof < 0:
        return None
    return int(ndof), inv, first[:ndof].copy()


def unique_i64(keys: np.ndarray):
    """First-occurrence dedup of a flat int64 array via the native
    open-addressing table: returns (uniq, inv) like
    ``np.unique(..., return_inverse=True)`` but WITHOUT sorting — uniq is in
    first-appearance order.  Falls back to np.unique when the native library
    is unavailable."""
    keys = np.ascontiguousarray(keys.reshape(-1), dtype=np.int64)
    out = dedup_rows(keys.reshape(-1, 1))
    if out is None:
        return np.unique(keys, return_inverse=True)
    nu, inv, first = out
    return keys[first], inv
