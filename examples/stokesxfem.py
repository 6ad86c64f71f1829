"""Unfitted Stokes interface problem, XFEM (enrichment) formulation.

Port of the reference tutorial ``py_tutorials/stokesxfem.py``: P2X/P1X
Taylor-Hood with XFESpace enrichment per velocity component and pressure,
Hansbo-averaged Nitsche interface coupling, surface-tension pressure jump,
zero-mean pressure via a NumberSpace Lagrange multiplier, and pressure ghost
penalty on the cut band (facet-patch form of the reference's dn-jump
skeleton stabilization).  Manufactured solution from Kirchhart/Gross/Reusken
(SISC 2016).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngsxfem_tpu import *
from ngsxfem_tpu.fem.space import NumberSpace


def run(nx=16, order=2, verbose=True, deform=False):
    mesh = MakeStructured2DMesh(
        quads=False, nx=nx, ny=nx, mapping=lambda a, b: (2 * a - 1, 2 * b - 1)
    )

    mu1, mu2 = 1.0, 10.0
    mu = [mu1, mu2]
    R = 2.0 / 3.0
    aneg = 1.0 / mu1
    apos = 1.0 / mu2 + (1.0 / mu1 - 1.0 / mu2) * exp(x * x + y * y - R * R)
    gammaf = 0.5  # surface tension = pressure jump

    levelset = sqrt(x * x + y * y) - R
    ee = exp(-1 * (x * x + y * y))
    src = CoefficientFunction((
        ee * ((-8 * y) + (4 * x * x * y) + (4 * y * y * y)) + 3 * x * x,
        ee * ((-4 * x * x * x) + (8 * x) - (4 * x * y * y)),
    ))
    vel_neg_ex = CoefficientFunction((aneg * ee * (-1.0) * y, aneg * ee * x))
    vel_pos_ex = CoefficientFunction((apos * ee * (-1.0) * y, apos * ee * x))
    p_neg_ex = x * x * x
    p_pos_ex = x * x * x - gammaf

    gamma_stab = 0.05
    lam = 0.5 * (mu1 + mu2) * 20 * order * order

    deformation = None
    if deform:
        lsetadap = LevelSetMeshAdaptation(mesh, order=order, threshold=10.5)
        deformation = lsetadap.CalcDeformation(levelset)
        lsetp1 = lsetadap.lset_p1
    else:
        lsetp1 = GridFunction(H1(mesh, order=1))
        InterpolateToP1(levelset, lsetp1)
    ci = CutInfo(mesh, lsetp1)

    Vh = H1(mesh, order=order, dirichlet=[1, 2, 3, 4], dgjumps=True)
    Vhx = XFESpace(Vh, ci)
    Qh = H1(mesh, order=order - 1, dgjumps=True)
    Qhx = XFESpace(Qh, ci)
    N = NumberSpace(mesh)
    WhG = FESpace([Vh, Vhx, Vh, Vhx, Qh, Qhx, N], dgjumps=True)

    u1s, u1x, u2s, u2x, ps, px, lagN = WhG.TrialFunction()
    v1s, v1x, v2s, v2x, qs, qx, lagM = WhG.TestFunction()

    h = specialcf.mesh_size
    n_lset = 1.0 / Norm(grad(lsetp1)) * grad(lsetp1)
    kappa = [CutRatioGF(ci), 1.0 - CutRatioGF(ci)]

    u1 = [u1s + op(u1x) for op in [neg, pos]]
    u2 = [u2s + op(u2x) for op in [neg, pos]]
    u = [CoefficientFunction((u1[i], u2[i])) for i in range(2)]
    p = [ps + op(px) for op in [neg, pos]]
    gradu1 = [grad(u1s) + op(u1x) for op in [neg_grad, pos_grad]]
    gradu2 = [grad(u2s) + op(u2x) for op in [neg_grad, pos_grad]]
    divu = [gradu1[i][0] + gradu2[i][1] for i in range(2)]
    Du = [CoefficientFunction(
        (2 * gradu1[i][0], gradu2[i][0] + gradu1[i][1],
         gradu2[i][0] + gradu1[i][1], 2 * gradu2[i][1]), dims=(2, 2))
        for i in range(2)]
    sigmaupn = [-mu[i] * (Du[i] * n_lset) + p[i] * n_lset for i in range(2)]
    average_flux_u = kappa[0] * sigmaupn[0] + kappa[1] * sigmaupn[1]

    v1 = [v1s + op(v1x) for op in [neg, pos]]
    v2 = [v2s + op(v2x) for op in [neg, pos]]
    v = [CoefficientFunction((v1[i], v2[i])) for i in range(2)]
    q = [qs + op(qx) for op in [neg, pos]]
    gradv1 = [grad(v1s) + op(v1x) for op in [neg_grad, pos_grad]]
    gradv2 = [grad(v2s) + op(v2x) for op in [neg_grad, pos_grad]]
    divv = [gradv1[i][0] + gradv2[i][1] for i in range(2)]
    Dv = [CoefficientFunction(
        (2 * gradv1[i][0], gradv2[i][0] + gradv1[i][1],
         gradv2[i][0] + gradv1[i][1], 2 * gradv2[i][1]), dims=(2, 2))
        for i in range(2)]
    sigmavqn = [-mu[i] * (Dv[i] * n_lset) + q[i] * n_lset for i in range(2)]
    average_flux_v = kappa[0] * sigmavqn[0] + kappa[1] * sigmavqn[1]
    average_inv_v = -kappa[1] * v[0] - kappa[0] * v[1]

    lset_neg = {"levelset": lsetp1, "domain_type": NEG, "subdivlvl": 0}
    lset_pos = {"levelset": lsetp1, "domain_type": POS, "subdivlvl": 0}
    lset_if = {"levelset": lsetp1, "domain_type": IF, "subdivlvl": 0}

    hasneg = ci.GetElementsOfType(HASNEG)
    haspos = ci.GetElementsOfType(HASPOS)
    hasif = ci.GetElementsOfType(IF)
    ba_facets = [GetFacetsWithNeighborTypes(mesh, a=hasneg, b=hasif),
                 GetFacetsWithNeighborTypes(mesh, a=haspos, b=hasif)]

    a = BilinearForm(WhG, symmetric=False)
    # viscosity
    a += SymbolicBFI(lset_neg, form=0.5 * mu1 * InnerProduct(Du[0], Dv[0]))
    a += SymbolicBFI(lset_pos, form=0.5 * mu2 * InnerProduct(Du[1], Dv[1]))
    # Nitsche interface coupling (Hansbo averages)
    a += SymbolicBFI(lset_if, form=InnerProduct(average_flux_u, v[0] - v[1]))
    a += SymbolicBFI(lset_if, form=InnerProduct(average_flux_v, u[0] - u[1]))
    a += SymbolicBFI(lset_if, form=lam / h * InnerProduct(u[0] - u[1], v[0] - v[1]))
    # pressure terms + zero-mean constraint (NumberSpace multiplier)
    a += SymbolicBFI(lset_neg, form=-divu[0] * q[0] - divv[0] * p[0]
                     + lagN * q[0] + lagM * p[0])
    a += SymbolicBFI(lset_pos, form=-divu[1] * q[1] - divv[1] * p[1])
    # pressure ghost penalty per side (facet-patch volumetric jump form of
    # the reference's dn-jump skeleton stabilization)
    pO = [ps.Other() + op(px.Other()) for op in [neg, pos]]
    qO = [qs.Other() + op(qx.Other()) for op in [neg, pos]]
    for i in range(2):
        a += SymbolicFacetPatchBFI(
            form=-gamma_stab * h * ((p[i] - pO[i]) * (q[i] - qO[i])),
            definedonelements=ba_facets[i])

    f = LinearForm(WhG)
    f += SymbolicLFI(lset_if, form=gammaf * InnerProduct(average_inv_v, n_lset))
    f += SymbolicLFI(lset_neg, form=src * v[0])
    f += SymbolicLFI(lset_pos, form=src * v[1])

    if deformation is not None:
        mesh.SetDeformation(deformation)
    a.Assemble()
    f.Assemble()

    gf = GridFunction(WhG)
    gf.components[0].Set(apos * ee * (-1.0) * y)
    gf.components[2].Set(apos * ee * x)
    import jax.numpy as jnp

    rhs = f._vec - a.mat * gf.vec.data
    free = WhG.FreeDofs()
    gf.vec.data = gf.vec.data + (a.mat.Inverse(free) * jnp.where(free.jnp, rhs, 0.0))

    # errors
    gu1 = [gf.components[0] + op(gf.components[1]) for op in [neg, pos]]
    gu2 = [gf.components[2] + op(gf.components[3]) for op in [neg, pos]]
    gp = [gf.components[4] + op(gf.components[5]) for op in [neg, pos]]
    uerr2 = Integrate(lset_neg, (gu1[0] - vel_neg_ex[0]) ** 2
                      + (gu2[0] - vel_neg_ex[1]) ** 2, mesh, order=2 * order + 2)
    uerr2 += Integrate(lset_pos, (gu1[1] - vel_pos_ex[0]) ** 2
                       + (gu2[1] - vel_pos_ex[1]) ** 2, mesh, order=2 * order + 2)
    perr2 = Integrate(lset_neg, (gp[0] - p_neg_ex) ** 2, mesh, order=2 * order)
    perr2 += Integrate(lset_pos, (gp[1] - p_pos_ex) ** 2, mesh, order=2 * order)
    if deformation is not None:
        mesh.UnsetDeformation()
    uerr, perr = uerr2 ** 0.5, perr2 ** 0.5
    if verbose:
        print(f"stokesxfem nx={nx} order={order}: "
              f"|u-uex|_L2={uerr:.2e} |p-pex|_L2={perr:.2e}")
    return uerr, perr


if __name__ == "__main__":
    run(nx=8)
    run(nx=16)
