"""Round-3 review regressions (ops/cf/spacetime pass):

1. InnerProduct / Norm on matrix-valued CFs reduce over ALL component axes
   (Frobenius), and InnerProduct of scalars is the plain product.
2. dt()/fix_t() proxy composition: unsupported combinations raise instead of
   silently evaluating the wrong operator; fix_t(dt(u), t) works.
3. SpaceTimeFESpace honors its own dirichlet= kwarg (reference binding,
   spacetime/python_spacetime.cpp:46-68).
4. SetTime/SetOverrideTime actually affect space-time GF evaluation.
5. TimeFixedCF forwards a per-context deformation override.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from ngsxfem_tpu import (
    H1, VectorH1, BilinearForm, SymbolicBFI, GridFunction, grad as Grad,
    InnerProduct, Norm, Integrate, MakeStructured2DMesh,
    CoefficientFunction, x, y,
)
from ngsxfem_tpu.spacetime import (
    SpaceTimeFESpace, ScalarTimeFE, dt, fix_t, tref, SpaceTimeInterpolateToP1,
)


def test_innerproduct_matrix_frobenius():
    mesh = MakeStructured2DMesh(quads=False, nx=4, ny=4)
    V = VectorH1(mesh, order=2)
    gf = GridFunction(V)
    gf.Set(CoefficientFunction((x * x, x * y)))
    # Grad = [[2x, 0], [y, x]]; |Grad|_F^2 = 4x^2 + y^2 + x^2
    got = Integrate(cf=InnerProduct(Grad(gf), Grad(gf)), mesh=mesh, order=4)
    assert abs(got - 2.0) < 1e-12, got


def test_norm_matrix_frobenius():
    mesh = MakeStructured2DMesh(quads=False, nx=2, ny=2)
    M = CoefficientFunction((1.0, 2.0, 2.0, 4.0), dims=(2, 2))
    got = Integrate(cf=Norm(M), mesh=mesh, order=2)
    assert abs(got - 5.0) < 1e-12, got  # sqrt(1+4+4+16) = 5


def test_innerproduct_scalar_is_product():
    mesh = MakeStructured2DMesh(quads=False, nx=3, ny=3)
    got = Integrate(cf=InnerProduct(x, y), mesh=mesh, order=3)
    assert abs(got - 0.25) < 1e-13, got


def test_dt_of_grad_raises():
    mesh = MakeStructured2DMesh(quads=False, nx=2, ny=2)
    W = SpaceTimeFESpace(H1(mesh, order=1), ScalarTimeFE(1))
    u, v = W.TnT()
    with pytest.raises(NotImplementedError):
        dt(Grad(u))
    with pytest.raises(NotImplementedError):
        dt(dt(u))
    # supported compositions still clone fine
    assert fix_t(Grad(u), 0.0).op == "fixtgrad"
    assert fix_t(dt(u), 0.0).op == "fixtdt"


def test_fix_t_of_dt_assembles_kron():
    """A[(ti,i),(tj,j)] for fix_t(dt(u),0)*fix_t(v,0) must equal
    kron(outer(dphi(0), phi(0)), M_spatial) in the time-major layout."""
    mesh = MakeStructured2DMesh(quads=False, nx=2, ny=2)
    Vs = H1(mesh, order=1)
    W = SpaceTimeFESpace(Vs, ScalarTimeFE(1))
    u, v = W.TnT()
    a = BilinearForm(W)
    a += SymbolicBFI(form=fix_t(dt(u), 0.0) * fix_t(v, 0.0))
    a.Assemble()
    A = np.asarray(a.mat.todense())

    us, vs = Vs.TnT()
    m = BilinearForm(Vs)
    m += SymbolicBFI(form=us * vs)
    m.Assemble()
    M = np.asarray(m.mat.todense())

    # nodes [0,1]: phi(0) = [1,0], dphi(0) = [-1,1]; dof layout is
    # time-major (dof = t*ndof_s + i), so the (test-time, trial-time)
    # block is phi_tst(0) * dphi_ttr(0) * M
    expected = np.kron(np.outer([1.0, 0.0], [-1.0, 1.0]), M)
    assert np.allclose(A, expected, atol=1e-12), np.abs(A - expected).max()


def test_spacetime_dirichlet_kwarg():
    mesh = MakeStructured2DMesh(quads=False, nx=3, ny=3)
    Vs = H1(mesh, order=1)  # no dirichlet on the spatial space
    W = SpaceTimeFESpace(Vs, ScalarTimeFE(1), dirichlet=[1, 2, 3, 4])
    ref = H1(mesh, order=1, dirichlet=[1, 2, 3, 4])
    expect = np.tile(ref.dirichlet_dofs, 2)
    assert np.array_equal(W.dirichlet_dofs, expect)
    assert W.dirichlet_dofs.any()
    free = ~W.FreeDofs().a
    assert np.array_equal(free, expect)


def test_set_time_gf_eval():
    mesh = MakeStructured2DMesh(quads=False, nx=3, ny=3)
    W = SpaceTimeFESpace(H1(mesh, order=1), ScalarTimeFE(1))
    gf = GridFunction(W)
    SpaceTimeInterpolateToP1(x + tref, tref, gf)
    # without a time context and without SetTime: error
    with pytest.raises(Exception):
        Integrate(cf=gf, mesh=mesh, order=2)
    W.SetTime(0.25)
    got = Integrate(cf=gf, mesh=mesh, order=2)
    assert abs(got - 0.75) < 1e-12, got  # int(x) + 0.25 = 0.5 + 0.25
    W.SetTime(0.5)  # changing the time must retrace, not reuse
    got = Integrate(cf=gf, mesh=mesh, order=2)
    assert abs(got - 1.0) < 1e-12, got
    W.SetTime(None)
    with pytest.raises(Exception):
        Integrate(cf=gf, mesh=mesh, order=2)


def test_timefixedcf_forwards_deformation_override():
    from ngsxfem_tpu.cf.context import EvalCtx, eval_pure

    mesh = MakeStructured2DMesh(quads=False, nx=2, ny=2)
    Vd = VectorH1(mesh, order=1)
    deform = GridFunction(Vd)
    deform.Set(CoefficientFunction((0.25 * x, 0.0 * y)))  # x -> 1.25 x
    ref_pts = jnp.broadcast_to(jnp.asarray([[0.2, 0.3]]),
                               (mesh.ne, 1, 2)).astype(jnp.float64)
    # per-context override while the mesh itself carries NO deformation
    ctx = EvalCtx(mesh, ref_pts, deformation=deform,
                  time=jnp.zeros((mesh.ne, 1)))
    got = eval_pure(fix_t(x + 0.0 * tref, 0.5), ctx)
    want = ctx.phys[..., 0]  # deformed x
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-12)
    # and the deformed x differs from the undeformed one somewhere
    ctx0 = EvalCtx(mesh, ref_pts, deformation=None)
    assert np.abs(np.asarray(want) - np.asarray(ctx0.phys[..., 0])).max() > 1e-3


@pytest.mark.parametrize("dom", ["NEG", "IF"])
def test_spacetime_quad_matches_stationary(dom):
    """On a QUAD mesh the space-time spatial slices must use the SAME
    multilinear rule as the stationary integrator — including the saddle
    sign pattern the fixed-diagonal simplex split gets wrong."""
    from ngsxfem_tpu import NEG, IF, InterpolateToP1

    d = {"NEG": NEG, "IF": IF}[dom]
    mesh = MakeStructured2DMesh(quads=True, nx=2, ny=2)
    phi = (x - 0.45) * (y - 0.55)  # saddle pattern on interior vertices
    V = H1(mesh, order=1)
    lset = GridFunction(V)
    InterpolateToP1(phi, lset)
    stat = Integrate(levelset_domain={"levelset": lset, "domain_type": d},
                     cf=1.0, mesh=mesh, order=2)
    W = SpaceTimeFESpace(V, ScalarTimeFE(1))
    lst = GridFunction(W)
    SpaceTimeInterpolateToP1(phi + 0.0 * tref, tref, lst)
    st = Integrate({"levelset": lst, "domain_type": d},
                   CoefficientFunction(1.0), mesh, order=2, time_order=2)
    # time-constant level set: slab integral == stationary x dt(=1)
    assert abs(st - stat) < 1e-12, (st, stat)
