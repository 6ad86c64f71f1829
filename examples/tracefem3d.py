"""TraceFEM: Laplace-Beltrami on an implicit sphere surface (3D).

Port of the reference tutorial ``py_tutorials/tracefem3d.py``: H1 space with
active dofs on cut elements, tangential-gradient surface form on the IF rule,
normal-diffusion volume stabilization on the cut band.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from math import pi

from ngsxfem_tpu import *


def run(nx=8, order=2, verbose=True, deform=True):
    mesh = MakeStructured3DMesh(
        hexes=False, nx=nx, ny=nx, nz=nx,
        mapping=lambda a, b, c: (2.82 * a - 1.41, 2.82 * b - 1.41, 2.82 * c - 1.41),
    )
    levelset = sqrt(x * x + y * y + z * z) - 1

    deformation = None
    if deform:
        lsetmeshadap = LevelSetMeshAdaptation(mesh, order=order, threshold=1000)
        deformation = lsetmeshadap.CalcDeformation(levelset)
        lset_approx = lsetmeshadap.lset_p1
    else:
        lset_approx = GridFunction(H1(mesh, order=1))
        InterpolateToP1(levelset, lset_approx)

    VhG = H1(mesh, order=order, dirichlet=[])
    ci = CutInfo(mesh, lset_approx)
    ba_IF = ci.GetElementsOfType(IF)
    cf_IF = BitArrayCF(ba_IF, mesh)
    freedofs = VhG.FreeDofs()
    freedofs &= GetDofsOfElements(VhG, ba_IF)

    gfu = GridFunction(VhG)
    n = 1.0 / sqrt(InnerProduct(grad(lset_approx), grad(lset_approx))) * grad(lset_approx)
    h = specialcf.mesh_size

    def Pmat(u):
        return u - (u * n) * n

    u, v = VhG.TnT()
    lset_if = {"levelset": lset_approx, "domain_type": IF, "subdivlvl": 0}

    diff_coeff = reac_coeff = 1
    a = BilinearForm(VhG, symmetric=True)
    a += SymbolicBFI(
        levelset_domain=lset_if,
        form=diff_coeff * (Pmat(grad(u)) * Pmat(grad(v))) + reac_coeff * u * v,
    )
    # normal-diffusion stabilization on the cut band (tracefem3d.py:91)
    a += SymbolicBFI(
        form=(diff_coeff / h + reac_coeff * h) * (cf_IF * (grad(u) * n)) * (grad(v) * n),
        definedonelements=ba_IF,
    )

    f_coeff = (
        sin(pi * z) * (diff_coeff * pi * pi * (1 - z * z) + reac_coeff)
        + diff_coeff * cos(pi * z) * 2 * pi * z
    )
    f = LinearForm(VhG)
    f += SymbolicLFI(levelset_domain=lset_if, form=f_coeff * v, definedonelements=ba_IF)

    if deformation is not None:
        mesh.SetDeformation(deformation)
    a.Assemble()
    f.Assemble()

    gfu.vec.data = a.mat.Inverse(freedofs) * f.vec.data

    exact = sin(pi * z)
    l2error = Integrate(
        levelset_domain=lset_if, cf=(gfu - exact) * (gfu - exact), mesh=mesh,
        order=2 * order,
    ) ** 0.5
    if deformation is not None:
        mesh.UnsetDeformation()
    if verbose:
        print("l2error :", l2error)
    return l2error


if __name__ == "__main__":
    run()
