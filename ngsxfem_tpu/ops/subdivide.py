"""Uniform simplex subdivision tables for the `subdivlvl>0` quadrature path.

TPU-native counterpart of the reference's legacy adaptive integration engine
(``cutint/xintegration.cpp:698+`` NumericalIntegrationStrategy::MakeQuadRule):
where the reference *recursively bisects* an element whose level set is a
genuine CoefficientFunction and builds rules on the leaf simplices, this
module precomputes a **uniform** dyadic subdivision of the reference element
into ``O(2^(d*lvl))`` sub-simplices on the host, so that at run time the level
set is evaluated once at the (deduplicated) subdivision lattice and the
existing batched straight-cut kernel (``ops/straightcut.cut_rule_simplices``)
runs over all sub-simplices of all elements at once — fixed shapes, no
recursion, no data-dependent control flow.

Uniform instead of adaptive subdivision is the deliberate TPU trade: the
reference prunes uncut sub-simplices during recursion
(``Simplex::CheckIfCut``, cutint/xdecompose.hpp:34-87); here every element
carries the full table and uncut sub-simplices fall through the straight-cut
kernel's cheap sign-uniform path.  Accuracy matches the reference contract:
the geometry error of the piecewise-linear interface approximation is
O((h·2^-lvl)^2), i.e. each extra level buys a factor ~4 (verified in
tests/test_backuprule.py).

Tensor-product elements (QUAD/HEX) are first split into 2/6 simplices
(``ET_SPLIT``) and each split simplex subdivided — the analog of the
reference's prism/simplex decomposition (``DecomposePrismIntoSimplices``,
cutint/xdecompose.hpp:131-149).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

from .cuttables import ET_SPLIT, REF_VERTS
from .gauss import ET_DIM


def _red_refine(sub):
    """Red-refine one d-simplex given by integer vertex rows (nv, d)."""
    nv = sub.shape[0]
    d = nv - 1
    v = sub
    if d == 1:
        m = (v[0] + v[1]) // 2
        return [np.stack([v[0], m]), np.stack([m, v[1]])]
    if d == 2:
        m01 = (v[0] + v[1]) // 2
        m12 = (v[1] + v[2]) // 2
        m02 = (v[0] + v[2]) // 2
        return [
            np.stack([v[0], m01, m02]),
            np.stack([m01, v[1], m12]),
            np.stack([m02, m12, v[2]]),
            np.stack([m01, m12, m02]),
        ]
    if d == 3:
        m01 = (v[0] + v[1]) // 2
        m02 = (v[0] + v[2]) // 2
        m03 = (v[0] + v[3]) // 2
        m12 = (v[1] + v[2]) // 2
        m13 = (v[1] + v[3]) // 2
        m23 = (v[2] + v[3]) // 2
        # 4 corner tets + central octahedron split along the m01-m23
        # diagonal (Bey red refinement; any diagonal is volume-exact)
        return [
            np.stack([v[0], m01, m02, m03]),
            np.stack([m01, v[1], m12, m13]),
            np.stack([m02, m12, v[2], m23]),
            np.stack([m03, m13, m23, v[3]]),
            np.stack([m01, m23, m02, m03]),
            np.stack([m01, m23, m03, m13]),
            np.stack([m01, m23, m13, m12]),
            np.stack([m01, m23, m12, m02]),
        ]
    raise NotImplementedError(f"subdivision for d={d}")


@lru_cache(maxsize=None)
def subdivision_tables(et: str, lvl: int):
    """Host tables (lattice (nlat, d) float64, subs (nsub, d+1) int32).

    `lattice` are deduplicated vertex coordinates of the level-`lvl` dyadic
    subdivision of the reference element `et`; `subs` indexes sub-simplex
    vertices into it.  Coordinates are exact dyadic rationals (built on an
    integer lattice scaled by 2^lvl, so dedup is exact).
    """
    if lvl < 0:
        raise ValueError("subdivlvl must be >= 0")
    d = ET_DIM[et]
    scale = 1 << lvl
    split = ET_SPLIT[et]
    refv = REF_VERTS[et]

    sub_list = []
    for s in split:
        # split-simplex vertices on the integer lattice (REF_VERTS are 0/1)
        base = np.asarray(np.rint(refv[s] * scale), dtype=np.int64)
        work = [base]
        for _ in range(lvl):
            work = [t for w in work for t in _red_refine(w)]
        sub_list.extend(work)

    key2id: dict[tuple, int] = {}
    lattice = []
    subs = np.empty((len(sub_list), d + 1), dtype=np.int32)
    for i, simplex in enumerate(sub_list):
        for j, vtx in enumerate(simplex):
            k = tuple(int(c) for c in vtx)
            idx = key2id.get(k)
            if idx is None:
                idx = len(lattice)
                key2id[k] = idx
                lattice.append(vtx)
            subs[i, j] = idx
    lattice_f = np.asarray(lattice, dtype=np.float64) / float(scale)
    return lattice_f, subs


