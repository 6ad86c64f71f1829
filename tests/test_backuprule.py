"""Port of the reference backup-rule suite
(tests/pytests/test_backuprule.py of ChrLackner/ngsxfem): integration with a
*genuine CoefficientFunction* level set through the ``subdivlvl`` path — the
TPU-native uniform-subdivision replacement for the reference's legacy adaptive
engine (cutint/xintegration.cpp:698+, ops/subdivide.py here).

Contracts carried over:
  - straight cuts stay exact to 5e-15*(order+1)^2 regardless of subdivlvl,
  - curved geometries converge at 2nd order under mesh refinement,
plus the subdiv-specific contract the reference engine provides implicitly:
each subdivision level shrinks the geometry error by ~4x on a fixed mesh.
"""
import warnings

import numpy as np
import pytest
from math import pi, log, sqrt as msqrt

from ngsxfem_tpu import (
    NEG, POS, IF, H1, GridFunction, Integrate, InterpolateToP1,
    MakeStructured2DMesh, MakeStructured3DMesh,
    BilinearForm, LinearForm, SymbolicCutBFI, SymbolicCutLFI, Parameter,
    x, y, z, sqrt, CoefficientFunction, tref,
)


@pytest.mark.parametrize("quad", [True, False])
@pytest.mark.parametrize("order", [2, 8])
@pytest.mark.parametrize("domain", [NEG, POS, IF])
@pytest.mark.parametrize("lvl", [1, 2])
def test_subdiv_straight_cut_2d_exact(order, domain, quad, lvl):
    mesh = MakeStructured2DMesh(quads=quad, nx=2, ny=2)
    levelset = 1 - 2 * x - 2 * y  # stays a CF: subdiv path, no P1 interpolation
    referencevals = {NEG: 7 / 8, POS: 1 / 8, IF: 1 / msqrt(2)}
    integral = Integrate(
        levelset_domain={"levelset": levelset, "domain_type": domain,
                         "subdivlvl": lvl},
        cf=CoefficientFunction(1), mesh=mesh, order=order,
    )
    error = abs(integral - referencevals[domain])
    assert error < 5e-15 * (order + 1) * (order + 1)


@pytest.mark.parametrize("hex_", [True, False])
@pytest.mark.parametrize("order", [2, 8])
@pytest.mark.parametrize("domain", [NEG, POS, IF])
def test_subdiv_straight_cut_3d_exact(order, domain, hex_):
    mesh = MakeStructured3DMesh(hexes=hex_, nx=1, ny=1, nz=1)
    levelset = 1 - 2 * x - 2 * y - 2 * z
    referencevals = {NEG: 47 / 48, POS: 1 / 48, IF: msqrt(3) / 8}
    integral = Integrate(
        levelset_domain={"levelset": levelset, "domain_type": domain,
                         "subdivlvl": 1},
        cf=CoefficientFunction(1), mesh=mesh, order=order,
    )
    error = abs(integral - referencevals[domain])
    assert error < 5e-15 * (order + 1) * (order + 1)


@pytest.mark.parametrize("domain", [NEG, POS, IF])
def test_subdiv_circle_eoc(domain):
    """Reference test_new_integrateX_via_circle_geom: CF level set, mesh
    refinement loop, mean EOC > 1.75 (2nd-order geometry approximation)."""
    r = 0.6
    referencevals = {POS: 1 - pi * r * r / 4, NEG: pi * r * r / 4,
                     IF: r * pi / 2}
    levelset = sqrt(x * x + y * y) - r
    errors = []
    for n in (2, 4, 8, 16, 32):
        mesh = MakeStructured2DMesh(quads=False, nx=n, ny=n)
        integral = Integrate(
            levelset_domain={"levelset": levelset, "domain_type": domain,
                             "subdivlvl": 1},
            cf=CoefficientFunction(1), mesh=mesh, order=4,
        )
        errors.append(abs(integral - referencevals[domain]))
    eoc = [log(errors[i] / errors[i + 1]) / log(2) for i in range(len(errors) - 1)]
    mean_eoc = sum(eoc[1:]) / len(eoc[1:])
    assert mean_eoc > 1.75, (errors, eoc)


@pytest.mark.parametrize("domain", [NEG, IF])
def test_subdiv_level_convergence(domain):
    """Each subdivision level shrinks the geometry error ~4x on a fixed
    coarse mesh (the legacy engine's accuracy knob, uniform here)."""
    r = 0.6
    referencevals = {NEG: pi * r * r / 4, IF: r * pi / 2}
    levelset = sqrt(x * x + y * y) - r
    mesh = MakeStructured2DMesh(quads=False, nx=2, ny=2)
    errors = []
    for lvl in (1, 2, 3, 4):
        integral = Integrate(
            levelset_domain={"levelset": levelset, "domain_type": domain,
                             "subdivlvl": lvl},
            cf=CoefficientFunction(1), mesh=mesh, order=4,
        )
        errors.append(abs(integral - referencevals[domain]))
    ratios = [errors[i] / errors[i + 1] for i in range(len(errors) - 1)]
    assert min(ratios) > 2.5, (errors, ratios)
    assert sum(ratios) / len(ratios) > 3.4, (errors, ratios)


def test_subdiv_assembly_matches_p1_on_linear_lset():
    """For a LINEAR level set the subdiv path and the P1 straight-cut path
    integrate the same geometry: cut mass matrices must agree."""
    mesh = MakeStructured2DMesh(quads=True, nx=4, ny=4)
    V = H1(mesh, order=1)
    u, v = V.TnT()
    levelset = 1 - 2 * x - 2 * y
    lsp1 = GridFunction(H1(mesh, order=1))
    InterpolateToP1(levelset, lsp1)

    def mass(ld):
        a = BilinearForm(V)
        # force_intorder=4: Q1 x Q1 on quads is bi-quadratic; both paths
        # must use an exact rule for a bitwise-comparable matrix
        a += SymbolicCutBFI(ld, form=u * v, force_intorder=4)
        a.Assemble()
        return np.asarray(a.mat.todense())

    A_p1 = mass({"levelset": lsp1, "domain_type": NEG})
    A_sd = mass({"levelset": levelset, "domain_type": NEG, "subdivlvl": 1})
    assert np.abs(A_p1 - A_sd).max() < 1e-13


def test_subdiv_interface_lfi():
    """IF linear form via subdiv: sum of the load vector = interface length."""
    mesh = MakeStructured2DMesh(quads=True, nx=4, ny=4)
    V = H1(mesh, order=1)
    _, v = V.TnT()
    r = 0.6
    levelset = sqrt(x * x + y * y) - r
    f = LinearForm(V)
    f += SymbolicCutLFI({"levelset": levelset, "domain_type": IF,
                         "subdivlvl": 2}, form=v)
    f.Assemble()
    tot = float(np.asarray(f.vec).sum())
    assert abs(tot - r * pi / 2) < 1e-3


def test_subdiv_moving_interface_reassembles():
    """A Parameter-driven level set re-assembles with fresh geometry (the
    advisor's round-2 stale-P1 failure mode must not resurface in the CF
    path) and without growing the jit cache."""
    from ngsxfem_tpu.forms.assemble import _ASM_CACHE

    mesh = MakeStructured2DMesh(quads=True, nx=4, ny=4)
    V = H1(mesh, order=1)
    u, v = V.TnT()
    rp = Parameter(0.5)
    levelset = sqrt(x * x + y * y) - rp
    a = BilinearForm(V)
    a += SymbolicCutBFI({"levelset": levelset, "domain_type": NEG,
                         "subdivlvl": 2}, form=u * v, force_intorder=4)
    a.Assemble()
    s1 = np.asarray(a.mat.todense()).sum()  # = NEG area (P1 partition of unity)
    n_compiled = len(_ASM_CACHE)
    rp.Set(0.8)
    a.Assemble()
    s2 = np.asarray(a.mat.todense()).sum()
    assert len(_ASM_CACHE) == n_compiled, "moving interface recompiled"
    assert abs(s1 - pi * 0.25 / 4) < 2e-3
    assert abs(s2 - pi * 0.64 / 4) < 2e-3


def test_subdiv_unsupported_kinds_raise():
    mesh = MakeStructured2DMesh(quads=False, nx=2, ny=2)
    V = H1(mesh, order=1)
    u, v = V.TnT()
    levelset = sqrt(x * x + y * y) - 0.6
    ld = {"levelset": levelset, "domain_type": NEG, "subdivlvl": 1}
    a = BilinearForm(V)
    a += SymbolicCutBFI(ld, form=u * v, skeleton=True)
    with pytest.raises(NotImplementedError):
        a.Assemble()


# ---------------------------------------------------------------------------
# space-time subdivision (the reference legacy engine's ET_SPACE x ET_TIME
# path, cutint/xintegration.cpp:698+: recursive bisection in space AND time)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("quad", [True, False])
@pytest.mark.parametrize("domain,ref", [(NEG, 7 / 8), (POS, 1 / 8), (IF, 0.5)])
def test_subdiv_spacetime_exact(quad, domain, ref):
    """A level set linear in space AND time is reproduced exactly by the
    space-time subdivision rule (cf. the reference 2D+1D straight-cut
    contract, tests/pytests/test_spacetimecutrule.py:38-68 — here driven
    through the genuine-CF subdivision path instead of a P1 ST GF)."""
    mesh = MakeStructured2DMesh(quads=quad, nx=1, ny=1)
    lev = 1 - 2 * x - 2 * tref  # genuine CF (tref-dependent)
    v = Integrate({"levelset": lev, "domain_type": domain, "subdivlvl": 1},
                  CoefficientFunction(1.0), mesh, order=1, time_order=1)
    assert abs(v - ref) < 5e-14


@pytest.mark.parametrize("domain", [NEG, IF])
def test_subdiv_spacetime_level_convergence(domain):
    """Each space-time subdivision level shrinks the geometry error of a
    moving-circle slab volume by ~4x (2nd-order P1-in-space-and-time
    approximation per cell)."""
    r0 = 0.5
    mesh = MakeStructured2DMesh(quads=False, nx=8, ny=8,
                                mapping=lambda a, b: (2 * a - 1, 2 * b - 1))
    lev = sqrt((x - 0.2 * tref) ** 2 + y * y) - r0
    exact = pi * r0 * r0 if domain == NEG else 2 * pi * r0
    errs = []
    for lvl in (1, 2, 3):
        v = Integrate({"levelset": lev, "domain_type": domain,
                       "subdivlvl": lvl},
                      CoefficientFunction(1.0), mesh, order=2, time_order=2)
        errs.append(abs(v - exact))
    for e0, e1 in zip(errs, errs[1:]):
        assert e0 / e1 > 2.5, errs


def test_subdiv_spacetime_assembly_matches_p1_st():
    """Space-time mass matrix with a linear-in-space-and-time CF level set:
    the subdivision path and the straight-cut P1 space-time GF path see the
    SAME exact cut geometry, so they agree up to the time-quadrature error
    of the iterated integral (the inner spatial integral is piecewise
    polynomial of degree ~4 in t, and the two paths slice time differently:
    at sub-slab edges/lattice-vertex roots vs element-vertex roots only).
    At time_order=6 the slice-wise Gauss rules are exact and the matrices
    must agree to round-off."""
    from ngsxfem_tpu import (
        ScalarTimeFE, SpaceTimeFESpace, SpaceTimeInterpolateToP1,
    )

    mesh = MakeStructured2DMesh(quads=False, nx=3, ny=3)
    V = H1(mesh, order=1)
    st = SpaceTimeFESpace(V, ScalarTimeFE(1))
    u, v = st.TnT()
    lev = x - 0.3 - 0.4 * tref
    lgf = GridFunction(st)
    SpaceTimeInterpolateToP1(lev, tref, lgf)

    def mat(ld, to):
        a = BilinearForm(st)
        a += SymbolicCutBFI(ld, form=u * v, time_order=to)
        a.Assemble()
        return np.asarray(a.mat.todense())

    ld_sub = {"levelset": lev, "domain_type": NEG, "subdivlvl": 1}
    ld_p1 = {"levelset": lgf, "domain_type": NEG}

    # sanity at the workhorse order: both integrate the NEG st-volume
    # exactly (partition of unity) and agree in the cut band to the
    # time-quadrature tolerance
    A2, B2 = mat(ld_sub, 2), mat(ld_p1, 2)
    assert abs(A2.sum() - 0.5) < 1e-13  # exact NEG st-volume
    assert abs(B2.sum() - 0.5) < 1e-13
    assert np.abs(A2 - B2).max() < 5e-4

    # with slice-exact time quadrature the two paths coincide
    A6, B6 = mat(ld_sub, 6), mat(ld_p1, 6)
    assert np.abs(A6 - B6).max() < 1e-13


def test_subdiv_spacetime_moving_slab_no_recompile():
    """Slab-marching with a Parameter-driven space-time CF level set through
    the subdivision path: each slab re-assembles with fresh geometry (NEG
    st-volume tracks the slab's analytic value) and the jit cache stays
    constant — the moving-interface contract of the spatial subdiv path,
    in space-time."""
    from ngsxfem_tpu import Parameter, ScalarTimeFE, SpaceTimeFESpace
    from ngsxfem_tpu.forms.assemble import _ASM_CACHE

    mesh = MakeStructured2DMesh(quads=False, nx=4, ny=4)
    V = H1(mesh, order=1)
    st = SpaceTimeFESpace(V, ScalarTimeFE(1))
    u, v = st.TnT()
    t0 = Parameter(0.0)
    dtt = 0.25
    lev = x - 0.2 - 0.5 * (t0 + dtt * tref)  # plane moving in time

    a = BilinearForm(st)
    a += SymbolicCutBFI({"levelset": lev, "domain_type": NEG, "subdivlvl": 1},
                        form=u * v, time_order=2)
    a.Assemble()
    n_compiled = len(_ASM_CACHE)

    for s in range(3):
        t0.Set(s * dtt)
        a.Assemble()
        vol = np.asarray(a.mat.todense()).sum()  # = NEG st-volume
        # exact: integral over tref of the NEG width 0.2 + 0.5*(t0+dtt*tref)
        exact = 0.2 + 0.5 * (s * dtt + dtt / 2)
        assert abs(vol - exact) < 1e-12, (s, vol, exact)
    assert len(_ASM_CACHE) == n_compiled, "slab marching recompiled"


def test_subdiv_banded_matches_uniform():
    """The banded two-tier subdivlvl path (VERDICT r3 item 5: the reference
    legacy engine PRUNES uncut sub-simplices, xdecompose.hpp:34-87) produces
    the SAME values as the uniform full-table path — uncut elements take the
    element plain rule (the reference's depth-0 pruning: CheckIfCut false ->
    plain rule), the band runs the same cut kernel — agreement is exact for
    integrands within quadrature exactness."""
    from ngsxfem_tpu.config import config

    for dim, lvl, tol in ((2, 2, 5e-14), (3, 2, 5e-13)):
        if dim == 2:
            mesh = MakeStructured2DMesh(quads=False, nx=7, ny=7)
            ls = sqrt(x * x + y * y) - 0.55
        else:
            mesh = MakeStructured3DMesh(hexes=False, nx=5, ny=5, nz=5)
            ls = sqrt(x * x + y * y + z * z) - 0.55
        f = 1.0 + x + y * y
        vals = {}
        for banded in (True, False):
            config.banded_subdiv = banded
            try:
                for dom in (NEG, POS, IF):
                    vals[(banded, dom)] = Integrate(
                        {"levelset": ls, "domain_type": dom,
                         "subdivlvl": lvl}, cf=f, mesh=mesh, order=4)
            finally:
                config.banded_subdiv = True
        for dom in (NEG, POS, IF):
            a, b = vals[(True, dom)], vals[(False, dom)]
            assert abs(a - b) <= tol * max(1.0, abs(b)), (dim, dom, a, b)


def test_subdiv_banded_moving_no_recompile():
    """A Parameter-driven level set through the BANDED subdiv Integrate
    keeps one compiled signature while the band stays within its bucketed
    capacity, and results track the geometry."""
    from ngsxfem_tpu.integrate import _INT_CACHE

    mesh = MakeStructured2DMesh(quads=False, nx=12, ny=12)
    rp = Parameter(0.5)
    ls = sqrt(x * x + y * y) - rp
    ld = {"levelset": ls, "domain_type": NEG, "subdivlvl": 2}
    a1 = Integrate(ld, cf=1.0, mesh=mesh, order=4)
    n = len(_INT_CACHE)
    for r, exact in ((0.55, pi * 0.55 ** 2 / 4), (0.6, pi * 0.36 / 4)):
        rp.Set(r)
        val = Integrate(ld, cf=1.0, mesh=mesh, order=4)
        assert abs(val - exact) < 3e-3, (r, val, exact)
    assert len(_INT_CACHE) == n, "banded subdiv recompiled on a moving lset"
    assert abs(a1 - pi * 0.25 / 4) < 3e-3
