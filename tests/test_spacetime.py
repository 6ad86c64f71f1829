"""Space-time cut-rule and moving-domain tests (port of the reference
tests/pytests/test_spacetimecutrule.py patterns: exact space-time volumes,
moving-geometry EOC, slab-coupled heat solve)."""
import os
import sys

from math import pi, log as mlog

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngsxfem_tpu import (
    NEG, POS, IF, H1, CoefficientFunction, GridFunction, Integrate,
    Make1DMesh, MakeStructured2DMesh, ScalarTimeFE, SpaceTimeFESpace,
    SpaceTimeInterpolateToP1, sqrt, tref, x, y,
)


@pytest.mark.parametrize("dom,expect", [(NEG, 0.5), (POS, 0.5), (IF, 1.0)])
def test_st_exact_1d(dom, expect):
    mesh = Make1DMesh(5)
    st = SpaceTimeFESpace(H1(mesh, order=1), ScalarTimeFE(1))
    lset = GridFunction(st)
    SpaceTimeInterpolateToP1(x - 0.3 - 0.4 * tref, tref, lset)
    v = Integrate({"levelset": lset, "domain_type": dom},
                  CoefficientFunction(1.0), mesh, order=3, time_order=2)
    assert abs(v - expect) < 1e-13


def test_st_exact_quadratic_time():
    mesh = Make1DMesh(4)
    st = SpaceTimeFESpace(H1(mesh, order=1), ScalarTimeFE(2))
    lset = GridFunction(st)
    SpaceTimeInterpolateToP1(x - 0.3 - 0.2 * tref * tref, tref, lset)
    v = Integrate({"levelset": lset, "domain_type": NEG},
                  CoefficientFunction(1.0), mesh, order=3, time_order=4)
    assert abs(v - (0.3 + 0.2 / 3)) < 1e-13


def test_st_moving_circle_eoc():
    r = 0.5
    errs = []
    for i in range(2):
        nx, nslab = 8 * 2**i, 2 * 2**i
        mesh = MakeStructured2DMesh(
            quads=False, nx=nx, ny=nx, mapping=lambda a, b: (2 * a - 1, 2 * b - 1)
        )
        st = SpaceTimeFESpace(H1(mesh, order=1), ScalarTimeFE(1))
        lset = GridFunction(st)
        tot = 0.0
        for s in range(nslab):
            t0, dts = s / nslab, 1.0 / nslab
            lev = sqrt((x - 0.2 * (t0 + dts * tref) + 0.1) ** 2 + y * y) - r
            SpaceTimeInterpolateToP1(lev, tref, lset)
            tot += dts * Integrate(
                {"levelset": lset, "domain_type": NEG},
                CoefficientFunction(1.0), mesh, order=2, time_order=2,
            )
        errs.append(abs(tot - pi * r * r))
    eoc = mlog(errs[0] / errs[1]) / mlog(2)
    assert eoc > 1.7, (errs, eoc)


def test_moving_domain_heat():
    from examples import moving_domain

    e1 = moving_domain.run(nx=12, nslab=4, verbose=False)
    e2 = moving_domain.run(nx=24, nslab=8, verbose=False)
    assert e2 < e1 / 2, (e1, e2)


def test_rectangular_petrov_galerkin_assembly():
    """BilinearForm(trialspace=, testspace=) (NGSolve's mixed constructor,
    used by the reference CG-in-time demo spaceP1_timeCGP1.py): with a
    P1-in-time trial space reduced by skip_first_node/only_first_node and a
    P0-in-time test space, the slab matrix of dt(u)*v is exactly (+/-) the
    spatial mass matrix, and a proxy from a third space raises."""
    import numpy as np
    import pytest
    from ngsxfem_tpu import (
        MakeStructured2DMesh, H1, ScalarTimeFE, SpaceTimeFESpace,
        BilinearForm, SymbolicBFI, dt,
    )

    mesh = MakeStructured2DMesh(quads=False, nx=2, ny=2)
    Vs = H1(mesh, order=1)
    W_i = SpaceTimeFESpace(Vs, ScalarTimeFE(1, skip_first_node=True))
    W_e = SpaceTimeFESpace(Vs, ScalarTimeFE(1, only_first_node=True))
    W_t = SpaceTimeFESpace(Vs, ScalarTimeFE(0))

    u_i = W_i.TrialFunction()
    u_e = W_e.TrialFunction()
    v_t = W_t.TestFunction()

    u, v = Vs.TnT()
    m = BilinearForm(Vs)
    m += SymbolicBFI(form=u * v)
    m.Assemble()
    M = np.asarray(m.mat.todense())

    # interior trial time basis = t, dt = 1  ->  spatial mass matrix
    a = BilinearForm(trialspace=W_i, testspace=W_t)
    a += SymbolicBFI(form=dt(u_i) * v_t, time_order=2)
    a.Assemble()
    assert a.mat.shape == (W_t.ndof, W_i.ndof)
    assert np.abs(np.asarray(a.mat.todense()) - M).max() < 1e-12

    # exterior trial time basis = 1-t, dt = -1  ->  minus the mass matrix
    ae = BilinearForm(trialspace=W_e, testspace=W_t)
    ae += SymbolicBFI(form=dt(u_e) * v_t, time_order=2)
    ae.Assemble()
    assert np.abs(np.asarray(ae.mat.todense()) + M).max() < 1e-12

    # a trial proxy from a space other than the declared trialspace raises
    bad = BilinearForm(trialspace=W_i, testspace=W_t)
    bad += SymbolicBFI(form=dt(u_e) * v_t, time_order=2)
    with pytest.raises(ValueError, match="trial"):
        bad.Assemble()


def test_heateq_cg_in_time_example():
    """CG-in-time Petrov-Galerkin heat equation (reference
    spacetime/py_demos/spaceP1_timeCGP1.py) converges under space-time
    refinement."""
    from examples import heateq_cg_spacetime

    e1 = heateq_cg_spacetime.run(nx=12, nslab=8, tend=0.25, verbose=False)[-1]
    e2 = heateq_cg_spacetime.run(nx=24, nslab=16, tend=0.25,
                                 verbose=False)[-1]
    assert e2 < e1 / 2, (e1, e2)


def test_st_kt3_multiroot_exact():
    """k_t=3 level set whose vertex time-polynomials have multiple roots in
    (0,1): subdivision+bisection slicing must capture all of them
    (reference root_finding, cutint/spacetimecutrule.cpp:6-95)."""
    import numpy as np

    mesh = MakeStructured2DMesh(quads=False, nx=4, ny=4)
    st = SpaceTimeFESpace(H1(mesh, order=1), ScalarTimeFE(3))
    lset = GridFunction(st)
    a, r0, r1, r2 = 2.5, 0.1, 0.45, 0.95
    c_cf = 0.55 + a * (tref - r0) * (tref - r1) * (tref - r2)
    SpaceTimeInterpolateToP1(x - c_cf, tref, lset)
    c3 = np.polynomial.Polynomial.fromroots([r0, r1, r2]) * a + 0.55
    exact = c3.integ()(1.0) - c3.integ()(0.0)
    for dom, ref in ((NEG, exact), (POS, 1 - exact), (IF, 1.0)):
        v = Integrate({"levelset": lset, "domain_type": dom},
                      CoefficientFunction(1.0), mesh, order=2, time_order=8)
        assert abs(v - ref) < 1e-12, (int(dom), v, ref)


def _sphere_ST_error(n_steps, i):
    """Port of area_of_a_sphere_ST_error (reference
    test_spacetimecutrule.py:332-388): a circle shrinking as a 3D sphere
    slice; summed slab volumes/lateral areas vs closed forms."""
    mesh = MakeStructured2DMesh(quads=False, nx=2**i, ny=2**i,
                                mapping=lambda a, b: (2 * a - 1, 2 * b - 1))
    r0 = 0.9
    st = SpaceTimeFESpace(H1(mesh, order=1), ScalarTimeFE(1))
    lset_p1 = GridFunction(st)
    delta_t = 1.0 / n_steps
    sum_vol = sum_int = 0.0
    for s in range(n_steps):
        t_abs = s * delta_t + delta_t * tref
        SpaceTimeInterpolateToP1(
            sqrt(x**2 + y**2 + t_abs * t_abs) - r0, tref, lset_p1)
        sum_vol += delta_t * Integrate(
            {"levelset": lset_p1, "domain_type": NEG},
            CoefficientFunction(1.0), mesh, time_order=1)
        sum_int += delta_t * Integrate(
            {"levelset": lset_p1, "domain_type": IF},
            CoefficientFunction(1.0), mesh, time_order=1)
    return (abs(sum_vol - 2.0 / 3 * pi * r0**3),
            abs(sum_int - 0.5 * pi**2 * r0**2))


def test_spacetime_area_of_a_sphere():
    errs = [_sphere_ST_error(2**(i + 2), i + 1) for i in range(3)]
    vol_err = [e[0] for e in errs]
    int_err = [e[1] for e in errs]
    eocs_v = [mlog(vol_err[i - 1] / vol_err[i]) / mlog(2)
              for i in range(1, len(vol_err))]
    eocs_i = [mlog(int_err[i - 1] / int_err[i]) / mlog(2)
              for i in range(1, len(int_err))]
    assert sum(eocs_v) / len(eocs_v) > 1.75, (vol_err, eocs_v)
    assert sum(eocs_i) / len(eocs_i) > 1.75, (int_err, eocs_i)


def _hypersphere_ST_error(n_steps, i):
    """Port of area_of_a_hypersphere_ST_error (reference
    test_spacetimecutrule.py:415-470): 4D ball sliced in time."""
    from ngsxfem_tpu import MakeStructured3DMesh, z

    mesh = MakeStructured3DMesh(
        hexes=False, nx=2**i, ny=2**i, nz=2**i,
        mapping=lambda a, b, c: (2 * a - 1, 2 * b - 1, 2 * c - 1))
    r0 = 0.9
    st = SpaceTimeFESpace(H1(mesh, order=1), ScalarTimeFE(1))
    lset_p1 = GridFunction(st)
    delta_t = 1.0 / n_steps
    sum_vol = sum_int = 0.0
    for s in range(n_steps):
        t_abs = s * delta_t + delta_t * tref
        SpaceTimeInterpolateToP1(
            sqrt(x**2 + y**2 + z**2 + t_abs * t_abs) - r0, tref, lset_p1)
        sum_vol += delta_t * Integrate(
            {"levelset": lset_p1, "domain_type": NEG},
            CoefficientFunction(1.0), mesh, time_order=1)
        sum_int += delta_t * Integrate(
            {"levelset": lset_p1, "domain_type": IF},
            CoefficientFunction(1.0), mesh, time_order=1)
    return (abs(sum_vol - pi**2 / 4 * r0**4),
            abs(sum_int - 8.0 / 3 * pi * r0**3))


def test_spacetime_area_of_a_hypersphere():
    errs = [_hypersphere_ST_error(2**(i + 3), i + 2) for i in range(2)]
    vol_err = [e[0] for e in errs]
    int_err = [e[1] for e in errs]
    eoc_v = mlog(vol_err[0] / vol_err[1]) / mlog(2)
    eoc_i = mlog(int_err[0] / int_err[1]) / mlog(2)
    assert eoc_v > 1.7, (vol_err, eoc_v)
    assert eoc_i > 1.7, (int_err, eoc_i)


def test_cg_in_time_variants():
    """skip_first_node/only_first_node (reference NodalTimeFE,
    SpaceTimeFE.hpp:50-97): the reduced bases are the corresponding full
    Lagrange polynomials, and a CG-in-time slab solve reproduces u = t."""
    import numpy as np
    import jax.numpy as jnp
    from ngsxfem_tpu import (
        MakeStructured2DMesh, H1, GridFunction, ScalarTimeFE, SpaceTimeFESpace,
        BilinearForm, LinearForm, SymbolicBFI, SymbolicLFI, dt, fix_t,
        CoefficientFunction,
    )

    mesh = MakeStructured2DMesh(quads=False, nx=2, ny=2)
    Vs = H1(mesh, order=1)
    tfe = ScalarTimeFE(1, skip_first_node=True)
    W = SpaceTimeFESpace(Vs, tfe)
    assert W.ndof == Vs.ndof  # one active time node
    assert not W.IsTimeNodeActive(0) and W.IsTimeNodeActive(1)

    u, v = W.TnT()
    a = BilinearForm(W)
    a += SymbolicBFI(form=dt(u) * v, time_order=2)
    a.Assemble()
    f = LinearForm(W)
    f += SymbolicLFI(form=CoefficientFunction(1.0) * v, time_order=2)
    f.Assemble()
    gfu = GridFunction(W)
    gfu.vec.data = a.mat.Inverse() * f.vec.data
    # u(x,t) = t (initial value 0 is built into the space)
    # trace at t=1 should be identically 1, at t=0 identically 0
    u1 = GridFunction(Vs)
    from ngsxfem_tpu import RestrictGFInTime

    RestrictGFInTime(gfu, 1.0, u1)
    assert np.max(np.abs(np.asarray(u1._arr) - 1.0)) < 1e-12
    RestrictGFInTime(gfu, 0.0, u1)
    assert np.max(np.abs(np.asarray(u1._arr))) < 1e-12

    only = ScalarTimeFE(2, only_first_node=True)
    Wo = SpaceTimeFESpace(Vs, only)
    assert Wo.ndof == Vs.ndof
    assert Wo.IsTimeNodeActive(0) and not Wo.IsTimeNodeActive(1)


def test_spacetime_skeleton_time_tensorized():
    """Space-time skeleton integrator (reference SymbolicFacetBilinearForm-
    Integrator2, xfem/symboliccutbfi.cpp:948-1102): skeleton=True with
    time_order>=0 tensorizes facet rules with time Gauss points.  A dt(u)*
    jump form on a CG-in-time space must reproduce the same solution as the
    volume form when the skeleton term's exact value is zero for continuous
    functions — here we check quadrature exactness directly: integrating
    tref^k over the skeleton x [0,1] gives |skeleton| / (k+1)."""
    import numpy as np
    import jax.numpy as jnp
    from ngsxfem_tpu import MakeStructured2DMesh, tref
    from ngsxfem_tpu.forms.assemble import Integral, _skeleton_ctx
    from ngsxfem_tpu.cf.context import eval_pure

    mesh = MakeStructured2DMesh(quads=False, nx=3, ny=3)
    for k in (1, 2, 3):
        integ = Integral(form=tref ** k, skeleton=True, time_order=k)
        ctx, e1, e2, w, mask = _skeleton_ctx(integ, mesh, 2)
        tv = eval_pure(tref ** k, ctx)
        got = float(jnp.sum(jnp.where(mask, w * tv, 0.0)))
        # structured 3x3 trig mesh interior skeleton: horizontal+vertical
        # facets (12 of length 1/3) + diagonals (9 of length sqrt(2)/3)
        meas = 12 * (1 / 3) + 9 * (np.sqrt(2) / 3)
        assert abs(got - meas / (k + 1)) < 1e-12 * (k + 1), (k, got)


def test_spacetime_quad_mesh_eoc():
    """Space-time cut rules on QUAD spatial meshes: volume of a moving
    circle, 2nd-order EOC under simultaneous space-time refinement."""
    import numpy as np
    from ngsxfem_tpu import (MakeStructured2DMesh, H1, SpaceTimeFESpace,
                             ScalarTimeFE, GridFunction,
                             SpaceTimeInterpolateToP1, Integrate,
                             CoefficientFunction, NEG, sqrt, tref, x, y)

    def vol(nx, nsteps):
        mesh = MakeStructured2DMesh(quads=True, nx=nx, ny=nx)
        st = SpaceTimeFESpace(H1(mesh, order=1), ScalarTimeFE(1))
        tot = 0.0
        for k in range(nsteps):
            t0, t1 = k / nsteps, (k + 1) / nsteps
            lset = GridFunction(st)
            phi = sqrt((x - (0.4 + 0.2 * (t0 + (t1 - t0) * tref))) ** 2
                       + (y - 0.5) ** 2) - 0.25
            SpaceTimeInterpolateToP1(phi, tref, lset)
            tot += float(Integrate({"levelset": lset, "domain_type": NEG},
                                   CoefficientFunction(1.0), mesh, order=2,
                                   time_order=2)) * (t1 - t0)
        return tot

    exact = np.pi * 0.25 ** 2
    errs = [abs(vol(nx, nx) - exact) for nx in (8, 16)]
    assert np.log2(errs[0] / errs[1]) > 1.75, errs


def test_spacetime_gridfunction_set():
    """GridFunction.Set on a SpaceTimeFESpace interpolates spatially at each
    active time node with tref fixed (reference demo
    spacetime/py_demos/set_test.py, incl. the only_first_node variant)."""
    import numpy as np

    from ngsxfem_tpu import (
        MakeStructured2DMesh, H1, GridFunction, SpaceTimeFESpace,
        ScalarTimeFE, CreateTimeRestrictedGF, Integrate, tref, x,
    )

    mesh = MakeStructured2DMesh(quads=False, nx=4, ny=4)
    for kw in ({}, {"skip_first_node": True}, {"only_first_node": True}):
        st = SpaceTimeFESpace(H1(mesh, order=2), ScalarTimeFE(2, **kw))
        gf = GridFunction(st)
        gf.Set(x + tref)
        for t in st.tfe.nodes:
            gs = CreateTimeRestrictedGF(gf, float(t))
            avg = Integrate(cf=gs, mesh=mesh, order=4)
            assert abs(avg - (0.5 + float(t))) < 1e-12, (kw, t, avg)
