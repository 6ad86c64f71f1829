"""Port of the reference TPMC hex corner-case suite
(``tests/pytests/test_quadchallenges.py:12-135``): exactness of the
multilinear iterated-integral cut rule on hex meshes for planar cuts, and
accuracy for genuinely trilinear level sets including topologically ambiguous
(TPMC) sign patterns.
"""
import numpy as np
import pytest

from ngsxfem_tpu import NEG, POS, IF, OPTIMAL, Integrate, InterpolateToP1
from ngsxfem_tpu import GridFunction, H1
from ngsxfem_tpu.mesh.structured import MakeStructured3DMesh
from ngsxfem_tpu.cf.coefficient import x, y, z


@pytest.mark.parametrize("order", [2, 4, 8])
@pytest.mark.parametrize("domain", [NEG, POS, IF])
def test_integrateX_straight_cut_hex3D(order, domain):
    mesh = MakeStructured3DMesh(hexes=True, nx=2, ny=2, nz=2)
    lset_approx = GridFunction(H1(mesh, order=1))
    InterpolateToP1(1 - 2 * x - 2 * y - 2 * z, lset_approx)
    referencevals = {int(POS): 1.0 / 48, int(NEG): 47.0 / 48,
                     int(IF): np.sqrt(3) / 8}
    integral = Integrate(
        levelset_domain={"levelset": lset_approx, "domain_type": domain},
        cf=1.0, mesh=mesh, order=order)
    assert abs(integral - referencevals[int(domain)]) < 5e-15 * (order + 1) ** 2


@pytest.mark.parametrize("domain", [NEG, POS])
@pytest.mark.parametrize("alpha", [0, 1, 2])
@pytest.mark.parametrize("dim", [x, y, z])
def test_integrateX_straight_cut_hex3D_polynomial(domain, alpha, dim):
    order = 4
    mesh = MakeStructured3DMesh(hexes=True, nx=5, ny=5, nz=5)
    lset_approx = GridFunction(H1(mesh, order=1))
    InterpolateToP1(1 - 2 * x - 2 * y - 2 * z, lset_approx)
    val_pos = 2 ** (-alpha - 3) / (alpha**3 + 6 * alpha * alpha + 11 * alpha + 6)
    referencevals = {int(POS): val_pos, int(NEG): 1.0 / (alpha + 1) - val_pos}
    integral = Integrate(
        levelset_domain={"levelset": lset_approx, "domain_type": domain,
                         "quad_dir_policy": OPTIMAL},
        cf=dim**alpha, mesh=mesh, order=order)
    assert abs(integral - referencevals[int(domain)]) < 5e-15 * (order + 1) ** 2


def test_integrateX_hex3D_zero_val_challenge():
    order, alpha = 4, 2
    mesh = MakeStructured3DMesh(hexes=True, nx=2, ny=2, nz=2)
    lset_approx = GridFunction(H1(mesh, order=1))
    InterpolateToP1(1 - 2 * x - 2 * y - 2 * z, lset_approx)
    val_pos = 2 ** (-alpha - 3) / (alpha**3 + 6 * alpha * alpha + 11 * alpha + 6)
    integral = Integrate(
        levelset_domain={"levelset": lset_approx, "domain_type": POS,
                         "quad_dir_policy": OPTIMAL},
        cf=x**alpha, mesh=mesh, order=order)
    assert abs(integral - val_pos) < 5e-15 * (order + 1) ** 2


# the trilinear TPMC test function of the reference
# (tests/pytests/test_quadchallenges.py:115):
_PHI_TPMC = x * ((7 * y - 13) * z + 6) + y * (3 - 8 * z) + 8 * z - 4


@pytest.mark.parametrize("order", [2, 4, 6])
def test_TPMC_case_single_hex(order):
    """One hex with the TPMC-ambiguous vertex pattern [-4,4,-1,-1,2,-3,5,-1]
    (reference vertex ordering): loose bounds as in the reference test."""
    mesh = MakeStructured3DMesh(hexes=True, nx=1, ny=1, nz=1)
    lset_approx = GridFunction(H1(mesh, order=1))
    InterpolateToP1(_PHI_TPMC, lset_approx)
    vols = {}
    for domain in (NEG, POS, IF):
        vols[int(domain)] = Integrate(
            levelset_domain={"levelset": lset_approx, "domain_type": domain},
            cf=1.0, mesh=mesh, order=order)
    assert vols[int(IF)] < 10
    assert abs(vols[int(NEG)] - 0.5167820912197415) < 0.75
    assert abs(vols[int(POS)] - 0.4825797907263282) < 0.75
    # partition of unity holds regardless of the TPMC ambiguity
    assert abs(vols[int(NEG)] + vols[int(POS)] - 1.0) < 1e-12


@pytest.mark.parametrize("order", [2, 4])
def test_TPMC_case_hex3D_accuracy(order):
    """10^3 hex mesh, trilinear level set: NEG/POS/IF against the reference's
    converged values (tests/pytests/test_quadchallenges.py:106-135)."""
    mesh = MakeStructured3DMesh(hexes=True, nx=10, ny=10, nz=10)
    lsetp1 = GridFunction(H1(mesh, order=1))
    InterpolateToP1(_PHI_TPMC, lsetp1)
    for domain, ref, tol in ((NEG, 0.51681, 1e-3), (POS, 0.48319, 1e-3),
                             (IF, 1.82169, 5e-3)):
        integral = Integrate(
            levelset_domain={"levelset": lsetp1, "domain_type": domain},
            cf=1.0, mesh=mesh, order=order)
        assert abs(integral - ref) < tol, (int(domain), integral)
