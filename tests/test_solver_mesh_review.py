"""Round-3 review regressions (solvers/mesh/parallel pass):

1. condensed_solve with a CUSTOM solver must hand it the genuine Schur
   complement A_CC - A_CL A_LL^{-1} A_LC, not bare A_CC.
2. prolongation_matrix on masked spaces (Compress/XFE 0-substituted
   el2dof slots) must not corrupt dof 0's node nor scatter weights
   into coarse column 0.
3. ReadGmsh drops orphan nodes (physical points / unreferenced nodes)
   instead of leaving singular H1 rows behind.
4. CompositeCutInfo.GetElementsOfType honors VOL_or_BND.
(The tet-bisection conformity regression lives in test_refine.py.)
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngsxfem_tpu import (
    H1, BitArray, Compress, MakeStructured2DMesh,
)


def _random_spd(n, rng):
    B = rng.standard_normal((n, n))
    return B @ B.T + n * np.eye(n)


def test_condensed_solve_custom_solver_gets_schur():
    from scipy.sparse import coo_matrix
    from scipy.sparse.linalg import splu

    from ngsxfem_tpu.solvers.condense import condensed_solve
    from ngsxfem_tpu.solvers.sparse import SparseMatrix

    rng = np.random.default_rng(3)
    n = 24
    Ad = _random_spd(n, rng)
    co = coo_matrix(Ad)
    import jax.numpy as jnp

    A = SparseMatrix(co.row, co.col, jnp.asarray(co.data), (n, n))
    b = rng.standard_normal(n)
    local = np.zeros(n, bool)
    local[::3] = True  # strongly coupled to the rest (dense A)

    seen = {}

    def my_solver(mat, rhs):
        seen["mat"] = mat
        return splu(mat.tocsc()).solve(rhs)

    x = np.asarray(condensed_solve(A, b, local, solver=my_solver))
    x_ref = np.linalg.solve(Ad, b)
    assert np.allclose(x, x_ref, atol=1e-8), np.abs(x - x_ref).max()
    # the custom solver must have received the corrected operator
    iC = np.nonzero(~local)[0]
    A_CC = Ad[np.ix_(iC, iC)]
    assert not np.allclose(seen["mat"].toarray(), A_CC)


def test_prolongation_matrix_masked_spaces():
    from ngsxfem_tpu.solvers.mg import prolongation_matrix

    mc = MakeStructured2DMesh(quads=False, nx=2, ny=2)
    mf = MakeStructured2DMesh(quads=False, nx=4, ny=4)
    Vc, Vf = H1(mc, order=1), H1(mf, order=1)
    P_full = prolongation_matrix(Vc, Vf).to_scipy().toarray()

    actc = np.ones(Vc.ndof, bool)
    actc[-1] = False  # drop the last coarse dof -> numbering unchanged
    actf = np.ones(Vf.ndof, bool)
    actf[-1] = False
    Vcc = Compress(Vc, BitArray(actc))
    Vfc = Compress(Vf, BitArray(actf))
    P_c = prolongation_matrix(Vcc, Vfc).to_scipy().toarray()
    assert P_c.shape == (Vf.ndof - 1, Vc.ndof - 1)
    assert np.allclose(P_c, P_full[:-1, :-1]), np.abs(
        P_c - P_full[:-1, :-1]).max()


def test_readgmsh_drops_orphan_nodes(tmp_path):
    from ngsxfem_tpu.mesh.io import ReadGmsh

    # unit square, two triangles, PLUS an orphan node 5 and a physical
    # point element on it
    msh = """$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
5
1 0 0 0
2 1 0 0
3 1 1 0
4 0 1 0
5 9 9 0
$EndNodes
$Elements
7
1 15 2 1 5 5
2 1 2 1 1 1 2
3 1 2 1 1 2 3
4 1 2 2 2 3 4
5 1 2 2 2 4 1
6 2 2 10 1 1 2 3
7 2 2 10 1 1 3 4
$EndElements
"""
    p = tmp_path / "orphan.msh"
    p.write_text(msh)
    m = ReadGmsh(str(p))
    assert m.nv == 4, m.nv  # orphan node dropped
    assert m.ne == 2
    # all 4 boundary facets still carry their tags
    bcs = sorted(m.bc_of_facet_np[m.boundary_facets_np].tolist())
    assert bcs == [1, 1, 2, 2], bcs
    # and an H1 mass matrix has no zero rows
    from ngsxfem_tpu import BilinearForm, SymbolicBFI

    V = H1(m, order=1)
    u, v = V.TnT()
    a = BilinearForm(V)
    a += SymbolicBFI(form=u * v)
    a.Assemble()
    A = np.asarray(a.mat.todense())
    assert (np.abs(A).sum(axis=1) > 1e-12).all()


def test_composite_cutinfo_vb_argument():
    from ngsxfem_tpu import IF, VOL, GridFunction, InterpolateToP1, x, y
    from ngsxfem_tpu.mesh.composite import (
        CompositeCutInfo, CompositeGridFunction, CompositeMesh,
    )

    m1 = MakeStructured2DMesh(quads=False, nx=2, ny=2)
    cm = CompositeMesh(m1.vertices_np, [("trig", m1.elements_np)])
    lset = CompositeGridFunction(cm)
    for gf in lset.gfs:
        InterpolateToP1(x + y - 0.8, gf)
    ci = CompositeCutInfo(cm, lset)
    vol_mask = ci.GetElementsOfType(IF).a
    assert vol_mask.any()
    # BND query must differ from (not silently equal) the VOL one, or raise
    try:
        bnd_mask = ci.GetElementsOfType(IF, "BND").a
    except NotImplementedError:
        return
    assert bnd_mask.shape != vol_mask.shape or not np.array_equal(
        bnd_mask, vol_mask)
