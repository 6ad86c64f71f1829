"""Round-3 review regressions (models/forms-evaluate/sparse pass):

1. The lattice fast path is fully dynamic in the level set: assembling a
   DIFFERENT radius through a model built at the original radius matches a
   model built at the new radius (identity rows + ghost-penalty band both
   re-marked on device).
2. The ELL paths' frozen ghost-penalty band poisons with NaN (never
   silently wrong) when the runtime band moved.
3. apply()/rhs() use the runtime active-dof mask.
4. apply_compact poisons on cut-capacity overflow.
5. dn() on vector spaces is (vdim,)-valued and assembles.
6. _dnk_factor samples O(1) reference offsets (exactness at fine h).
7. SparseMatrix.Inverse rejects unknown methods and supports "cg".
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from ngsxfem_tpu.models.poisson import UnfittedPoisson


def _models(nx=6, r1=0.35, r2=0.45):
    m1 = UnfittedPoisson(nx=nx, dim=3, order=1, dtype=jnp.float64, radius=r1)
    m2 = UnfittedPoisson(nx=nx, dim=3, order=1, dtype=jnp.float64, radius=r2)
    return m1, m2


def test_lattice_assembly_tracks_moving_levelset():
    m1, m2 = _models()
    dst1 = m1.dia_structure()
    dst2 = m2.dia_structure()
    assert np.array_equal(np.asarray(dst1["offsets"]),
                          np.asarray(dst2["offsets"]))  # topology-only
    V_moved, _ = m1.assemble_vals_lattice(m1.vertices, m2.lset, dst1)
    V_ref, _ = m2.assemble_vals_lattice(m2.vertices, m2.lset, dst2)
    d = np.abs(np.asarray(V_moved) - np.asarray(V_ref)).max()
    assert d < 1e-12, d


def test_ell_band_guard_poisons_on_moved_band():
    m1, m2 = _models()
    st = m1.ell_structure()
    cap = int(m1.active.sum()) + 64
    # same level set: clean
    V_ok, _ = m1.assemble_ell_vals(m1.vertices, m1.lset, cap, st)
    assert np.isfinite(np.asarray(V_ok)).all()
    # moved level set: the frozen gp band no longer matches -> NaN poison
    V_bad, _ = m1.assemble_ell_vals(m1.vertices, m2.lset, cap, st)
    assert np.isnan(np.asarray(V_bad)).any()


def test_ell_identity_rows_dynamic():
    """With an unchanged gp band but a slightly perturbed level set the
    identity rows must follow the RUNTIME active set."""
    m1, _ = _models()
    st = m1.ell_structure()
    cap = int(m1.active.sum()) + 64
    V, _ = m1.assemble_ell_vals(m1.vertices, m1.lset, cap, st)
    V = np.asarray(V)
    # inactive dofs: diagonal == 1, rest of row == 0
    diag = V.reshape(-1)[np.asarray(st["diag_slots"])]
    act = np.asarray(m1.active_dof_mask(m1.lset))
    assert np.allclose(diag[~act], 1.0)
    rows = V[~act]
    offd = rows.sum(axis=1) - diag[~act]
    assert np.abs(offd).max() < 1e-14


def test_apply_and_rhs_use_runtime_active_mask():
    m1, m2 = _models()
    # rhs with the m2 level set must mark m2's active dofs, not m1's
    b = np.asarray(m1.rhs(m1.vertices, m2.lset, lambda p: jnp.ones(
        p.shape[:-1], dtype=p.dtype)))
    act2 = np.asarray(m2.active_dof_mask(m2.lset))
    assert np.abs(b[~act2]).max() == 0.0
    assert np.abs(b[act2]).max() > 0
    # apply at the INIT level set stays clean (band unchanged)
    x = np.random.default_rng(0).standard_normal(m1.ndof)
    y = np.asarray(m1.apply(m1.vertices, m1.lset, jnp.asarray(x)))
    assert np.isfinite(y).all()
    # apply at the moved level set poisons (frozen gp band)
    y2 = np.asarray(m1.apply(m1.vertices, m2.lset, jnp.asarray(x)))
    assert np.isnan(y2).any()


def test_apply_compact_overflow_poisons():
    m1, _ = _models()
    y = np.asarray(m1.apply_compact(
        m1.vertices, m1.lset, jnp.ones(m1.ndof, dtype=jnp.float64), 1))
    assert np.isnan(y).any(), "overflowed cut capacity must poison"


def test_dn_vector_space():
    from ngsxfem_tpu import (
        H1, VectorH1, BilinearForm, SymbolicBFI, InnerProduct,
        MakeStructured2DMesh, dn,
    )

    mesh = MakeStructured2DMesh(quads=False, nx=2, ny=2)
    V = VectorH1(mesh, order=1, dgjumps=True)
    u, v = V.TnT()
    du = dn(u)
    assert du.dims == (2,)
    Vs = H1(mesh, order=1, dgjumps=True)
    us, vs = Vs.TnT()
    a = BilinearForm(V)
    a += SymbolicBFI(
        form=InnerProduct(dn(u) - dn(u.Other()), dn(v) - dn(v.Other())),
        skeleton=True)
    a.Assemble()
    A = np.asarray(a.mat.todense())
    # proxies must come from the SAME space instance as the BilinearForm
    # (instance-identity semantics, as in NGSolve) — the rectangular-form
    # space-membership guard enforces this
    s = BilinearForm(Vs)
    s += SymbolicBFI(
        form=(dn(us) - dn(us.Other())) * (dn(vs) - dn(vs.Other())),
        skeleton=True)
    s.Assemble()
    S = np.asarray(s.mat.todense())
    n = S.shape[0]
    # block layout: vector form == block-diag of the scalar form
    assert np.allclose(A[:n, :n], S, atol=1e-12)
    assert np.allclose(A[n:, n:], S, atol=1e-12)
    assert np.abs(A[:n, n:]).max() < 1e-14


def test_dnk_reference_scaled_sampling_exact():
    """dn(u) of a known polynomial at fine h: the reference-scaled nodes
    keep the Vandermonde differentiation exact (f64 here; the raw
    physical-unit sampling loses (1/h)^(p-k) digits)."""
    from ngsxfem_tpu import (
        H1, GridFunction, LinearForm, SymbolicLFI, MakeStructured2DMesh, dn,
        x as cfx,
    )

    mesh = MakeStructured2DMesh(quads=False, nx=64, ny=64)
    V = H1(mesh, order=3, dgjumps=True)
    u, v = V.TnT()
    f = LinearForm(V)
    # dn on the boundary-facet normal of x^3: checked through a facet-patch
    # bilinear form against the analytic directional derivative is heavy;
    # instead check the factor directly on one element row
    from ngsxfem_tpu.cf.context import EvalCtx
    from ngsxfem_tpu.forms.evaluate import _dnk_factor

    E = mesh.ne
    pts = jnp.broadcast_to(jnp.asarray([[0.25, 0.25]]), (E, 1, 2))
    nrm = jnp.broadcast_to(jnp.asarray([1.0, 0.0]), (E, 1, 2))
    ctx = EvalCtx(mesh, pts, normal=nrm)
    arr = np.asarray(_dnk_factor(mesh.et, 3, 1, ctx))  # (E,1,ndl)
    # interpolate g = x^3 and form the dof-weighted sum: d/dn g = 3x^2
    gf = GridFunction(V)
    gf.Set(cfx * cfx * cfx)
    dofs = np.asarray(gf._arr)[V.el2dof_np]  # (E, ndl)
    got = (arr[:, 0, :] * dofs).sum(axis=1)
    # physical x at the evaluation points
    from ngsxfem_tpu.cf.context import eval_pure
    from ngsxfem_tpu.cf.coefficient import wrap

    px = np.asarray(ctx.phys[..., 0])[:, 0]
    assert np.abs(got - 3 * px**2).max() < 1e-9


def test_inverse_method_dispatch():
    from scipy.sparse import coo_matrix

    from ngsxfem_tpu.solvers.sparse import SparseMatrix

    rng = np.random.default_rng(1)
    B = rng.standard_normal((12, 12))
    Ad = B @ B.T + 12 * np.eye(12)
    co = coo_matrix(Ad)
    A = SparseMatrix(co.row, co.col, jnp.asarray(co.data), (12, 12))
    b = rng.standard_normal(12)
    x_lu = np.asarray(A.Inverse() * b)
    x_cg = np.asarray(A.Inverse(inverse="cg") * b)
    x_ref = np.linalg.solve(Ad, b)
    assert np.allclose(x_lu, x_ref, atol=1e-8)
    assert np.allclose(x_cg, x_ref, atol=1e-6)
    with pytest.raises(ValueError):
        A.Inverse(inverse="bogus")
