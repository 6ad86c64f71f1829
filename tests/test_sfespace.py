"""SFESpace (1D polynomials on the level-set zero line, 2D TRIGs) —
port of the reference's experimental space (xfem/sFESpace.cpp)."""
import numpy as np

from ngsxfem_tpu import (
    MakeStructured2DMesh, H1, GridFunction, InterpolateToP1, SFESpace,
    BilinearForm, LinearForm, SymbolicBFI, SymbolicLFI, Integrate,
    sqrt, x, y, IF, NEG,
)


def _setup(nx=10):
    mesh = MakeStructured2DMesh(
        quads=False, nx=nx, ny=nx, mapping=lambda a, b: (3 * a - 1.5, 3 * b - 1.5))
    lsetp1 = GridFunction(H1(mesh, order=1))
    InterpolateToP1(sqrt(x * x + y * y) - 1.0, lsetp1)
    return mesh, lsetp1


def test_sfespace_dof_count():
    mesh, lsetp1 = _setup()
    S = SFESpace(mesh, lsetp1, order=1)
    ncut = S.CutElements().NumSet()
    assert ncut > 0
    assert S.ndof == 2 * ncut


def test_sfespace_l2_projection_exact_for_linears():
    # x + y restricted to each straight interface segment is linear in the
    # chord parameter -> representable exactly by order-1 SFESpace
    mesh, lsetp1 = _setup()
    S = SFESpace(mesh, lsetp1, order=1)
    u, v = S.TnT()
    lset_if = {"levelset": lsetp1, "domain_type": IF}
    a = BilinearForm(S)
    a += SymbolicBFI(lset_if, form=u * v)
    a.Assemble()
    f = LinearForm(S)
    f += SymbolicLFI(lset_if, form=(x + y) * v)
    f.Assemble()
    gfu = GridFunction(S)
    # mass matrix is block-diagonal per cut element; restrict to active dofs
    gfu.vec.data = a.mat.Inverse(S.FreeDofs()) * f.vec.data
    err = Integrate(lset_if, (gfu - (x + y)) * (gfu - (x + y)), mesh,
                    order=4)
    assert abs(err) < 1e-20, err
