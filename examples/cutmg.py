"""CutFEM geometric multigrid on the fictitious-domain Poisson problem
(analog of the reference prototype python/cutmg.py + py_demos)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from ngsxfem_tpu import *
from ngsxfem_tpu.solvers.mg import (
    CutFemSmoother, MultiGridCL, prolongation_matrix,
)
from ngsxfem_tpu.solvers.krylov import cg, masked_matvec


def build_level(mesh, order=1):
    r = (sqrt(x * x + y * y) if mesh.dim == 2
         else sqrt(x * x + y * y + z * z))
    levelset = r - 0.6
    lsetp1 = GridFunction(H1(mesh, order=1))
    InterpolateToP1(levelset, lsetp1)
    ci = CutInfo(mesh, lsetp1)
    hasneg = ci.GetElementsOfType(HASNEG)
    hasif = ci.GetElementsOfType(IF)
    Vh = H1(mesh, order=order, dgjumps=True)
    ba_facets = GetFacetsWithNeighborTypes(mesh, a=hasneg, b=hasif)
    h = specialcf.mesh_size
    n_lset = 1.0 / Norm(grad(lsetp1)) * grad(lsetp1)
    u, v = Vh.TnT()
    lset_neg = {"levelset": lsetp1, "domain_type": NEG}
    lset_if = {"levelset": lsetp1, "domain_type": IF}
    a = BilinearForm(Vh)
    a += SymbolicBFI(lset_neg, form=grad(u) * grad(v), definedonelements=hasneg)
    a += SymbolicBFI(lset_if, form=-(grad(u) * n_lset) * v - (grad(v) * n_lset) * u
                     + 20.0 / h * u * v)
    a += SymbolicFacetPatchBFI(form=0.5 / (h * h) * (u - u.Other()) * (v - v.Other()),
                               definedonelements=ba_facets)
    a.Assemble()
    f = LinearForm(Vh)
    f += SymbolicLFI(lset_neg, form=CoefficientFunction(1.0) * v,
                     definedonelements=hasneg)
    f.Assemble()
    active = GetDofsOfElements(Vh, hasneg)
    if_dofs = GetDofsOfElements(Vh, hasif)
    return Vh, a.mat, f.vec.data, active, if_dofs


def run(nx0=8, levels=3, order=1, verbose=True, dim=2):
    """dim=3 runs the same V-cycle on a sphere cut out of a tet box — the
    reference prototype (python/cutmg.py) is 2D-only."""
    if dim == 2:
        meshes = [
            MakeStructured2DMesh(quads=False, nx=nx0 * 2**l, ny=nx0 * 2**l,
                                 mapping=lambda a, b: (2 * a - 1, 2 * b - 1))
            for l in range(levels)
        ]
    else:
        meshes = [
            MakeStructured3DMesh(hexes=False, nx=nx0 * 2**l, ny=nx0 * 2**l,
                                 nz=nx0 * 2**l,
                                 mapping=lambda a, b, c:
                                 (2 * a - 1, 2 * b - 1, 2 * c - 1))
            for l in range(levels)
        ]
    spaces, mats, rhss, actives, ifdofs = [], [], [], [], []
    for m in meshes:
        Vh, A, b, act, ifd = build_level(m, order)
        spaces.append(Vh), mats.append(A), rhss.append(b)
        actives.append(act), ifdofs.append(ifd)

    prols = [prolongation_matrix(spaces[l], spaces[l + 1])
             for l in range(levels - 1)]
    smoothers = [None] + [
        CutFemSmoother(mats[l], freedofs=actives[l], if_dofs=ifdofs[l])
        for l in range(1, levels)
    ]
    mgpre = MultiGridCL(mats, prols, smoothers, coarse_freedofs=actives[0])

    A = mats[-1]
    b = rhss[-1]
    fm = jnp.asarray(actives[-1].np)
    mv = masked_matvec(A.matvec, fm)
    bm = jnp.where(fm, b, 0.0)

    x_mg, it_mg, res_mg = cg(mv, bm, M=lambda r: jnp.where(fm, mgpre(r), r),
                             maxiter=100, tol=1e-8)
    # Jacobi-CG reference
    from ngsxfem_tpu.solvers.krylov import jacobi_preconditioner

    x_j, it_j, res_j = cg(mv, bm, M=jacobi_preconditioner(A.diagonal(), fm),
                          maxiter=2000, tol=1e-8)
    if verbose:
        print(f"MG-CG iters: {int(it_mg)} (res {float(res_mg):.2e}); "
              f"Jacobi-CG iters: {int(it_j)} (res {float(res_j):.2e})")
        print("solution diff:", float(jnp.linalg.norm(x_mg - x_j)))
    return int(it_mg), int(it_j), float(jnp.linalg.norm(x_mg - x_j))


if __name__ == "__main__":
    run()
