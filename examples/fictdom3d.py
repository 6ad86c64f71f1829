"""3D fictitious-domain Poisson through the general forms API
(the BASELINE benchmark configuration, user-API variant of
models/poisson.py): Nitsche BC on a sphere + facet-patch ghost penalty.

With ``isoparametric=True`` the mesh is deformed by a 3D
LevelSetMeshAdaptation so the high-order scheme sees high-order geometry
(order k converges at k+1 instead of the P1-geometry-limited 2).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngsxfem_tpu import *


def run(nx=8, order=1, verbose=True, isoparametric=False):
    mesh = MakeStructured3DMesh(
        hexes=False, nx=nx, ny=nx, nz=nx,
        mapping=lambda a, b, c: (2 * a - 1, 2 * b - 1, 2 * c - 1),
    )
    R = 0.7
    r = sqrt(x * x + y * y + z * z)
    levelset = r - R
    # u = R^2 - r^2 (zero on the boundary), f = -lap u = 6
    exact = R * R - (x * x + y * y + z * z)
    coeff_f = CoefficientFunction(6.0)
    h = specialcf.mesh_size
    lam = 10 * order * order / h

    if isoparametric:
        lsa = LevelSetMeshAdaptation(mesh, order=order, threshold=0.2,
                                     discontinuous_qn=True)
        deform = lsa.CalcDeformation(levelset)
        lsetp1 = lsa.lset_p1
        mesh.SetDeformation(deform)
    else:
        lsetp1 = GridFunction(H1(mesh, order=1))
        InterpolateToP1(levelset, lsetp1)
    ci = CutInfo(mesh, lsetp1)
    hasneg = ci.GetElementsOfType(HASNEG)
    hasif = ci.GetElementsOfType(IF)
    Vh = H1(mesh, order=order, dgjumps=True)
    ba_facets = GetFacetsWithNeighborTypes(mesh, a=hasneg, b=hasif)
    n_lset = 1.0 / Norm(grad(lsetp1)) * grad(lsetp1)
    u, v = Vh.TnT()

    lset_neg = {"levelset": lsetp1, "domain_type": NEG}
    lset_if = {"levelset": lsetp1, "domain_type": IF}

    a = BilinearForm(Vh)
    a += SymbolicBFI(lset_neg, form=grad(u) * grad(v), definedonelements=hasneg)
    a += SymbolicBFI(lset_if, form=-(grad(u) * n_lset) * v - (grad(v) * n_lset) * u
                     + lam * u * v)
    a += SymbolicFacetPatchBFI(
        form=0.1 / (h * h) * (u - u.Other()) * (v - v.Other()),
        definedonelements=ba_facets,
    )
    f = LinearForm(Vh)
    f += SymbolicLFI(lset_neg, form=coeff_f * v, definedonelements=hasneg)

    a.Assemble()
    f.Assemble()
    gfu = GridFunction(Vh)
    gfu.vec.data = a.mat.Inverse(GetDofsOfElements(Vh, hasneg)) * f.vec.data

    l2error = Integrate(lset_neg, (gfu - exact) * (gfu - exact), mesh,
                        order=2 * order + 2) ** 0.5
    if isoparametric:
        mesh.UnsetDeformation()
    if verbose:
        print("L2 Error:", l2error)
    return l2error


if __name__ == "__main__":
    run()
