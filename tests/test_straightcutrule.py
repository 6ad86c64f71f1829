"""Port of the reference quadrature acceptance suite
(tests/pytests/test_straightcutrule.py of ChrLackner/ngsxfem): analytic
exactness on straight cuts and geometric EOC for curved geometries.
"""
import pytest
from math import pi, log, sqrt as msqrt

from ngsxfem_tpu import (
    NEG, POS, IF, H1, GridFunction, Integrate, InterpolateToP1,
    Make1DMesh, MakeStructured2DMesh, MakeStructured3DMesh,
    x, y, z, sqrt, CoefficientFunction,
)


@pytest.mark.parametrize("domain", [NEG, POS, IF])
@pytest.mark.parametrize("alpha", [2, 4, 8])
def test_polynomial_ET_Segm(domain, alpha):
    order = alpha
    mesh = Make1DMesh(1)
    x_ast = 0.78522
    levelset = x_ast - x
    referencevals = {
        POS: x_ast ** (alpha + 1) / (alpha + 1),
        NEG: (1 - x_ast ** (alpha + 1)) / (alpha + 1),
        IF: x_ast**alpha,
    }
    lset_approx = GridFunction(H1(mesh, order=1))
    lset_approx.Set(levelset)
    f = x**alpha
    integral = Integrate(
        levelset_domain={"levelset": lset_approx, "domain_type": domain},
        cf=f, mesh=mesh, order=order,
    )
    error = abs(integral - referencevals[domain])
    assert error < 5e-15 * (order + 1) * (order + 1)


@pytest.mark.parametrize("quad", [True, False])
@pytest.mark.parametrize("order", [2, 4, 8])
@pytest.mark.parametrize("domain", [NEG, POS, IF])
@pytest.mark.parametrize("N", [1, 10])
def test_straight_cut_2d_exact(order, domain, quad, N):
    mesh = MakeStructured2DMesh(quads=quad, nx=N, ny=N)
    levelset = 1 - 2 * x - 2 * y
    referencevals = {NEG: 7 / 8, POS: 1 / 8, IF: 1 / msqrt(2)}
    lset_approx = GridFunction(H1(mesh, order=1))
    InterpolateToP1(levelset, lset_approx)
    integral = Integrate(
        levelset_domain={"levelset": lset_approx, "domain_type": domain},
        cf=CoefficientFunction(1), mesh=mesh, order=order,
    )
    error = abs(integral - referencevals[domain])
    assert error < 5e-15 * (order + 1) * (order + 1)


@pytest.mark.parametrize("quad", [True, False])
@pytest.mark.parametrize("order", [2, 4, 8])
@pytest.mark.parametrize("domain", [NEG, POS])
@pytest.mark.parametrize("alpha", [0, 1, 2])
@pytest.mark.parametrize("dim", ["x", "y"])
def test_straight_cut_2d_polynomial(order, domain, quad, alpha, dim):
    mesh = MakeStructured2DMesh(quads=quad, nx=1, ny=1)
    levelset = 1 - 2 * x - 2 * y
    val_pos = 2 ** (-alpha - 2) / (alpha * alpha + 3 * alpha + 2)
    referencevals = {POS: val_pos, NEG: 1.0 / (alpha + 1) - val_pos}
    lset_approx = GridFunction(H1(mesh, order=1))
    InterpolateToP1(levelset, lset_approx)
    f = (x if dim == "x" else y) ** alpha
    integral = Integrate(
        levelset_domain={"levelset": lset_approx, "domain_type": domain},
        cf=f, mesh=mesh, order=order,
    )
    error = abs(integral - referencevals[domain])
    assert error < 5e-15 * (order + 1) * (order + 1)


@pytest.mark.parametrize("quad", [False, True])
@pytest.mark.parametrize("domain", [IF, NEG, POS])
@pytest.mark.parametrize("dim", ["x", "y"])
@pytest.mark.parametrize("eps", [1e-1, 1e-2, 5e-3, 1e-3, 0])
def test_orth_cut_2d_epsiloned(domain, quad, dim, eps):
    order = 2
    mesh = MakeStructured2DMesh(quads=quad, nx=1, ny=1)
    if dim == "x":
        levelset = 1 - 2 * x + eps * (y - 0.5)
    else:
        levelset = 1 - 2 * y + eps * (x - 0.5)
    referencevals = {NEG: 1.0 / 2, POS: 1.0 / 2, IF: msqrt(1.0 + eps * eps / 4)}
    lset_approx = GridFunction(H1(mesh, order=1))
    InterpolateToP1(levelset, lset_approx)
    integral = Integrate(
        levelset_domain={"levelset": lset_approx, "domain_type": domain},
        cf=CoefficientFunction(1), mesh=mesh, order=order,
    )
    error = abs(integral - referencevals[domain])
    assert error < 5e-15 * (order + 1) * (order + 1)


@pytest.mark.parametrize("quad", [True, False])
@pytest.mark.parametrize("order", [2, 4, 8])
@pytest.mark.parametrize("domain", [NEG, POS, IF])
def test_straight_cut_3d_exact(order, domain, quad):
    mesh = MakeStructured3DMesh(hexes=quad, nx=1, ny=1, nz=1)
    levelset = 1 - 2 * x - 2 * y - 2 * z
    referencevals = {POS: 1.0 / 48, NEG: 47.0 / 48, IF: msqrt(3) / 8}
    lset_approx = GridFunction(H1(mesh, order=1))
    InterpolateToP1(levelset, lset_approx)
    integral = Integrate(
        levelset_domain={"levelset": lset_approx, "domain_type": domain},
        cf=CoefficientFunction(1), mesh=mesh, order=order,
    )
    error = abs(integral - referencevals[domain])
    assert error < 5e-15 * (order + 1) * (order + 1)


@pytest.mark.parametrize("quad", [True, False])
@pytest.mark.parametrize("domain", [NEG, POS])
@pytest.mark.parametrize("alpha", [0, 1, 2])
@pytest.mark.parametrize("dim", ["x", "y", "z"])
def test_straight_cut_3d_polynomial(domain, quad, alpha, dim):
    order = 4
    mesh = MakeStructured3DMesh(hexes=quad, nx=1, ny=1, nz=1)
    levelset = 1 - 2 * x - 2 * y - 2 * z
    val_pos = 2 ** (-alpha - 3) / (alpha**3 + 6 * alpha * alpha + 11 * alpha + 6)
    referencevals = {POS: val_pos, NEG: 1.0 / (alpha + 1) - val_pos}
    lset_approx = GridFunction(H1(mesh, order=1))
    InterpolateToP1(levelset, lset_approx)
    f = {"x": x, "y": y, "z": z}[dim] ** alpha
    integral = Integrate(
        levelset_domain={"levelset": lset_approx, "domain_type": domain},
        cf=f, mesh=mesh, order=order,
    )
    error = abs(integral - referencevals[domain])
    assert error < 5e-15 * (order + 1) * (order + 1)


@pytest.mark.parametrize("quad", [True, False])
@pytest.mark.parametrize("domain", [NEG, POS, IF])
def test_circle_geom_eoc(quad, domain):
    """EOC > 1.75 for P1-interpolated circle geometry (reference :37-68)."""
    order = 4
    r = 0.6
    levelset = sqrt(x * x + y * y) - r
    referencevals = {POS: 1 - pi * r * r / 4, NEG: pi * r * r / 4, IF: r * pi / 2}
    errors = []
    n_ref = 6
    for i in range(n_ref):
        mesh = MakeStructured2DMesh(quads=quad, nx=2**i, ny=2**i)
        lset_approx = GridFunction(H1(mesh, order=1))
        InterpolateToP1(levelset, lset_approx)
        integral = Integrate(
            levelset_domain={"levelset": lset_approx, "domain_type": domain},
            cf=CoefficientFunction(1), mesh=mesh, order=order,
        )
        errors.append(abs(integral - referencevals[domain]))
    eoc = [log(errors[i + 1] / errors[i]) / log(0.5) for i in range(n_ref - 1)]
    mean_eoc = sum(eoc[1:]) / len(eoc[1:])
    assert mean_eoc > 1.75, f"errors={errors}, eoc={eoc}"


@pytest.mark.parametrize("domain", [NEG, POS])
def test_sphere_geom_eoc_hexes(domain):
    order = 2
    r = 0.7234436998
    levelset = sqrt(x * x + y * y + z * z) - r
    referencevals = {POS: 1 - pi * r**3 / 6, NEG: pi * r**3 / 6}
    errors = []
    n_ref = 5
    for i in range(n_ref):
        mesh = MakeStructured3DMesh(hexes=True, nx=2**i, ny=2**i, nz=2**i)
        lset_approx = GridFunction(H1(mesh, order=1))
        InterpolateToP1(levelset, lset_approx)
        integral = Integrate(
            levelset_domain={"levelset": lset_approx, "domain_type": domain},
            cf=CoefficientFunction(1), mesh=mesh, order=order,
        )
        errors.append(abs(integral - referencevals[domain]))
    eoc = [log(errors[i + 1] / errors[i]) / log(0.5) for i in range(n_ref - 1)]
    mean_eoc = sum(eoc[1:]) / len(eoc[1:])
    assert mean_eoc > 1.75, f"errors={errors}, eoc={eoc}"


def test_partition_of_unity_random_tet():
    """NEG + POS measures must exactly tile every element (decomposition
    consistency check for all sign patterns)."""
    import numpy as np

    rng = np.random.default_rng(0)
    mesh = MakeStructured3DMesh(hexes=False, nx=2, ny=2, nz=2)
    V = H1(mesh, order=1)
    lset = GridFunction(V)
    lset.vec = rng.standard_normal(V.ndof)
    tot = 0.0
    for dom in (NEG, POS):
        tot += Integrate(
            levelset_domain={"levelset": lset, "domain_type": dom},
            cf=CoefficientFunction(1), mesh=mesh, order=2,
        )
    assert abs(tot - 1.0) < 1e-13
