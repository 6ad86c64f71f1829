"""Channel-lattice stencil operator (solvers/stencilop.py): the
zero-gather matvec for Lagrange spaces on structured meshes.

No reference counterpart (NGSolve always assembles generic sparse
matrices); correctness contract here is exact agreement with the generic
partial-assembly apply (itself pinned to the assembled matrix by
tests/test_operator.py) on the reference's order-2 operating point
(fictdom Nitsche + ghost penalty, py_tutorials/fictdom_ghostpen.py).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from ngsxfem_tpu import (
    BilinearForm, CutInfo, GetFacetsWithNeighborTypes, H1, HASNEG, IF,
    LevelSetMeshAdaptation, MakeStructured2DMesh, MakeStructured3DMesh,
    NEG, Norm, SymbolicBFI, SymbolicFacetPatchBFI, grad, specialcf, sqrt,
    x, y, z,
)
from ngsxfem_tpu.solvers.operator import PartialAssemblyOperator
from ngsxfem_tpu.solvers.stencilop import (LatticeStencilOperator,
                                           lattice_dof_map)


def _fictdom_form(mesh, order):
    r = sqrt(x * x + y * y + z * z) if mesh.dim == 3 else sqrt(x * x + y * y)
    lsa = LevelSetMeshAdaptation(mesh, order=order, threshold=0.2,
                                 discontinuous_qn=True)
    lsa.CalcDeformation(r - 0.7)
    mesh.SetDeformation(lsa.deform)
    ci = CutInfo(mesh, lsa.lset_p1)
    hasneg = ci.GetElementsOfType(HASNEG)
    hasif = ci.GetElementsOfType(IF)
    Vh = H1(mesh, order=order, dgjumps=True)
    ba = GetFacetsWithNeighborTypes(mesh, a=hasneg, b=hasif)
    nl = 1.0 / Norm(grad(lsa.lset_p1)) * grad(lsa.lset_p1)
    u, v = Vh.TnT()
    h = specialcf.mesh_size
    a = BilinearForm(Vh)
    a += SymbolicBFI({"levelset": lsa.lset_p1, "domain_type": NEG},
                     form=grad(u) * grad(v), definedonelements=hasneg)
    a += SymbolicBFI({"levelset": lsa.lset_p1, "domain_type": IF},
                     form=-(grad(u) * nl) * v - (grad(v) * nl) * u
                     + 40.0 / h * u * v)
    a += SymbolicFacetPatchBFI(
        form=0.1 / (h * h) * (u - u.Other()) * (v - v.Other()),
        definedonelements=ba)
    a.Assemble()
    return a, Vh


@pytest.mark.parametrize("order", [1, 2])
def test_stencil_matches_partial_assembly_3d(order):
    mesh = MakeStructured3DMesh(
        hexes=False, nx=6, ny=6, nz=6,
        mapping=lambda a, b, c: (2 * a - 1, 2 * b - 1, 2 * c - 1))
    try:
        a, Vh = _fictdom_form(mesh, order)
        op_st = a.AssembleOperator()               # auto: lattice path
        op_pa = a.AssembleOperator(lattice=False)  # generic apply
        assert isinstance(op_st, LatticeStencilOperator)
        assert isinstance(op_pa, PartialAssemblyOperator)
        rng = np.random.default_rng(3)
        xv = jnp.asarray(rng.standard_normal(Vh.ndof),
                         dtype=a.mat.vals.dtype)
        y_st, y_pa = op_st.matvec(xv), op_pa.matvec(xv)
        den = float(jnp.linalg.norm(y_pa)) or 1.0
        assert float(jnp.linalg.norm(y_st - y_pa)) / den < 5e-13
        d_st, d_pa = op_st.diagonal(), op_pa.diagonal()
        dden = float(jnp.linalg.norm(d_pa)) or 1.0
        assert float(jnp.linalg.norm(d_st - d_pa)) / dden < 5e-13
    finally:
        mesh.UnsetDeformation()


def test_stencil_order2_2d_plain_laplace():
    mesh = MakeStructured2DMesh(quads=False, nx=7, ny=5)
    Vh = H1(mesh, order=2)
    u, v = Vh.TnT()
    a = BilinearForm(Vh)
    a += SymbolicBFI(form=grad(u) * grad(v) + u * v)
    a.Assemble()
    op_st = a.AssembleOperator()
    assert isinstance(op_st, LatticeStencilOperator)
    op_pa = a.AssembleOperator(lattice=False)
    xv = jnp.asarray(np.sin(np.arange(Vh.ndof)), dtype=a.mat.vals.dtype)
    y_st, y_pa = op_st.matvec(xv), op_pa.matvec(xv)
    den = float(jnp.linalg.norm(y_pa)) or 1.0
    assert float(jnp.linalg.norm(y_st - y_pa)) / den < 5e-13


def test_unstructured_mesh_falls_back():
    # perturb interior vertices: no uniform lattice -> generic operator
    mesh = MakeStructured2DMesh(quads=False, nx=5, ny=5)
    V = mesh.vertices_np.copy()
    interior = ((V[:, 0] > 1e-9) & (V[:, 0] < 1 - 1e-9)
                & (V[:, 1] > 1e-9) & (V[:, 1] < 1 - 1e-9))
    rng = np.random.default_rng(0)
    V[interior] += 0.02 * rng.standard_normal(V[interior].shape)
    from ngsxfem_tpu.mesh.mesh import Mesh
    m2 = Mesh(mesh.et, V, mesh.elements_np)
    Vh = H1(m2, order=2)
    assert lattice_dof_map(Vh) is None
    u, v = Vh.TnT()
    a = BilinearForm(Vh)
    a += SymbolicBFI(form=grad(u) * grad(v))
    a.Assemble()
    assert isinstance(a.AssembleOperator(), PartialAssemblyOperator)
    with pytest.raises(ValueError):
        a.AssembleOperator(lattice=True)
