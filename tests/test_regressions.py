"""Round-3 regression tests for the round-2 advisor findings (ADVICE.md):

1. stale P1 level-set geometry on re-Assemble after updating a non-P1
   level set (reference re-runs CF2GFForStraightCutRule per assembly),
2. mesh.Refine() on meshes with periodic identification,
3. BND integrals under an active mesh deformation,
4. MultiGridCL coarse solve on a non-SPD block (LU fallback, no silent NaNs),
5. ScalarTimeFE.IsNodeActive bound check.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from ngsxfem_tpu import (
    NEG, POS, IF, H1, VectorH1, BilinearForm, LinearForm, SymbolicBFI,
    SymbolicLFI, GridFunction, InterpolateToP1, MakeStructured2DMesh,
    CoefficientFunction, x, y, VOL, BND,
)


def _neg_area_via_mass(mesh, lset_ho):
    V = H1(mesh, order=1)
    u, v = V.TnT()
    a = BilinearForm(V)
    a += SymbolicBFI(levelset_domain={"levelset": lset_ho, "domain_type": NEG},
                     form=u * v)
    a.Assemble()
    one = np.ones(V.ndof)
    return float(one @ np.asarray(a.mat.todense()) @ one), a


def test_reassemble_after_levelset_update():
    """Updating a non-P1 level set and re-assembling must re-interpolate the
    P1 geometry (ADVICE r2 medium: stale `_ensure_p1_ld` cache)."""
    mesh = MakeStructured2DMesh(quads=False, nx=16, ny=16)
    Vho = H1(mesh, order=3)
    lset_ho = GridFunction(Vho)
    lset_ho.Set((x - 0.5) ** 2 + (y - 0.5) ** 2 - 0.25 ** 2)

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        area1, a = _neg_area_via_mass(mesh, lset_ho)
        assert abs(area1 - np.pi * 0.25 ** 2) < 8e-3  # P1 geometry, h=1/16

        # grow the circle and re-assemble THE SAME form object
        lset_ho.Set((x - 0.5) ** 2 + (y - 0.5) ** 2 - 0.4 ** 2)
        a.Assemble()
        one = np.ones(a.space.ndof)
        area2 = float(one @ np.asarray(a.mat.todense()) @ one)
    assert abs(area2 - np.pi * 0.4 ** 2) < 8e-3, (
        "re-Assemble reused stale P1 level-set geometry")


def test_refine_periodic_mesh_guard():
    """Refine() must not leave a stale periodic facet identification
    (ADVICE r2 low: broadcast crash in GetFacetsWithNeighborTypes)."""
    mesh = MakeStructured2DMesh(quads=False, nx=4, ny=4, periodic="x")
    assert (mesh.periodic_facet_np >= 0).any()
    with pytest.raises(NotImplementedError):
        mesh.Refine()

    # non-periodic refine keeps the identification array consistent
    m2 = MakeStructured2DMesh(quads=False, nx=4, ny=4)
    m2.Refine()
    assert len(m2.periodic_facet_np) == m2.nfacets
    assert (m2.periodic_facet_np == -1).all()


def test_bnd_integral_sees_deformation():
    """BND integrals under SetDeformation integrate over the DEFORMED
    boundary (ADVICE r2 low: _boundary_ctx ignored the deformation)."""
    mesh = MakeStructured2DMesh(quads=False, nx=4, ny=4)
    Vd = VectorH1(mesh, order=1)
    deform = GridFunction(Vd)
    # linear stretch x -> 1.25 x: perimeter 4 -> 2*(1.25 + 1) = 4.5
    deform.Set(CoefficientFunction((0.25 * x, 0.0 * y)))

    V = H1(mesh, order=1)
    u, v = V.TnT()
    f = LinearForm(V)
    f += SymbolicLFI(form=v, VOL_or_BND=BND)
    mesh.SetDeformation(deform)
    try:
        f.Assemble()
    finally:
        mesh.UnsetDeformation()
    per = float(np.sum(np.asarray(f.vec)))
    assert abs(per - 4.5) < 1e-12, per

    # undeformed reference check
    f2 = LinearForm(V)
    f2 += SymbolicLFI(form=v, VOL_or_BND=BND)
    f2.Assemble()
    per0 = float(np.sum(np.asarray(f2.vec)))
    assert abs(per0 - 4.0) < 1e-12


def test_mg_coarse_solve_indefinite():
    """Non-SPD coarse block: LU fallback instead of silent NaNs
    (ADVICE r2 low: unchecked device cholesky)."""
    from ngsxfem_tpu.solvers.mg import MultiGridCL
    from ngsxfem_tpu.solvers.sparse import SparseMatrix

    # indefinite 2x2: diag(1, -1)
    A = SparseMatrix(np.array([0, 1]), np.array([0, 1]),
                     jnp.asarray([1.0, -1.0]), (2, 2))
    mg = MultiGridCL([A], [], [None])
    b = jnp.asarray([2.0, 3.0])
    xsol = np.asarray(mg(b))
    assert np.all(np.isfinite(xsol))
    assert np.allclose(xsol, [2.0, -3.0], atol=1e-12)


def test_timefe_node_bounds():
    from ngsxfem_tpu.spacetime.timefe import ScalarTimeFE

    fe = ScalarTimeFE(2)
    assert all(fe.IsNodeActive(i) for i in range(3))
    with pytest.raises(IndexError):
        fe.IsNodeActive(3)
    with pytest.raises(IndexError):
        fe.IsNodeActive(-1)
