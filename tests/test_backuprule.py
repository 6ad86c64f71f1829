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
    x, y, z, sqrt, CoefficientFunction,
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
    with pytest.raises(NotImplementedError):
        Integrate(levelset_domain={"levelset": levelset, "domain_type": NEG,
                                   "subdivlvl": 1, "time_order": 1},
                  cf=CoefficientFunction(1), mesh=mesh, order=2)
