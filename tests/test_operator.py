"""Matrix-free (partial-assembly) operator: BilinearForm.AssembleOperator
must apply exactly the matrix Assemble would build — same compiled
element-matrix program, applied gather -> batched einsum -> scatter-add
instead of materialized (solvers/operator.py; no reference counterpart)."""
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngsxfem_tpu import (
    NEG, IF, HASNEG, H1, BilinearForm, CutInfo, GetDofsOfElements,
    GetFacetsWithNeighborTypes, GridFunction, InterpolateToP1,
    MakeStructured2DMesh, MakeStructured3DMesh, Norm, SymbolicBFI,
    SymbolicFacetPatchBFI, grad, specialcf, sqrt, x, y, z,
)
from ngsxfem_tpu.solvers.krylov import cg


def _fictdom(dim=3, nx=6, order=2):
    if dim == 3:
        mesh = MakeStructured3DMesh(hexes=False, nx=nx, ny=nx, nz=nx)
        lev = sqrt((x - .5) ** 2 + (y - .5) ** 2 + (z - .5) ** 2) - 0.4
    else:
        mesh = MakeStructured2DMesh(quads=False, nx=nx, ny=nx)
        lev = sqrt((x - .5) ** 2 + (y - .5) ** 2) - 0.4
    lsetp1 = GridFunction(H1(mesh, order=1))
    InterpolateToP1(lev, lsetp1)
    ci = CutInfo(mesh, lsetp1)
    hasneg = ci.GetElementsOfType(HASNEG)
    hasif = ci.GetElementsOfType(IF)
    V = H1(mesh, order=order, dgjumps=True)
    u, v = V.TnT()
    h = specialcf.mesh_size
    nl = 1.0 / Norm(grad(lsetp1)) * grad(lsetp1)
    gp = GetFacetsWithNeighborTypes(mesh, a=hasneg, b=hasif)
    a = BilinearForm(V)
    a += SymbolicBFI({"levelset": lsetp1, "domain_type": NEG},
                     form=grad(u) * grad(v), definedonelements=hasneg)
    a += SymbolicBFI({"levelset": lsetp1, "domain_type": IF},
                     form=-(grad(u) * nl) * v - (grad(v) * nl) * u
                     + 40.0 / h * u * v)
    a += SymbolicFacetPatchBFI(
        form=0.1 / (h * h) * (u - u.Other()) * (v - v.Other()),
        definedonelements=gp)
    return mesh, V, hasneg, a


@pytest.mark.parametrize("dim", [2, 3])
def test_operator_equals_assembled_matvec(dim):
    _, V, _, a = _fictdom(dim=dim)
    a.Assemble()
    op = a.AssembleOperator()
    rng = np.random.default_rng(0)
    xv = jnp.asarray(rng.standard_normal(V.ndof))
    y_mat = np.asarray(a.mat.ell().matvec(xv))
    y_op = np.asarray(op.matvec(xv))
    scale = max(1e-30, np.abs(y_mat).max())
    assert np.abs(y_mat - y_op).max() < 1e-12 * scale

    d_mat = np.asarray(a.mat.diagonal())
    d_op = np.asarray(op.diagonal())
    assert np.abs(d_mat - d_op).max() < 1e-12 * max(1e-30, np.abs(d_mat).max())


def test_operator_pcg_solves_fictdom():
    """Jacobi-PCG driven purely through the matrix-free operator (projected
    to the active dofs) reaches 1e-8 on the order-2 unfitted system."""
    _, V, hasneg, a = _fictdom(dim=3, nx=6, order=2)
    op = a.AssembleOperator()
    free = jnp.asarray(np.asarray(GetDofsOfElements(V, hasneg)))
    b = jnp.where(free, 1.0, 0.0)
    d = op.diagonal()
    dinv = jnp.where(jnp.abs(d) > 1e-30, 1.0 / d, 0.0)
    mv = lambda xx: jnp.where(free, op.matvec(jnp.where(free, xx, 0.0)), 0.0)
    sol = cg(mv, b, maxiter=500, tol=1e-9,
             M=lambda r: jnp.where(free, dinv * r, 0.0))
    sol = sol[0] if isinstance(sol, tuple) else sol
    res = float(jnp.linalg.norm(mv(sol) - b) / jnp.linalg.norm(b))
    assert res < 1e-8, res


def test_operator_without_assemble():
    """AssembleOperator works without a prior Assemble call (it runs the
    same compiled program itself)."""
    _, V, _, a = _fictdom(dim=2, nx=8, order=1)
    op = a.AssembleOperator()
    a.Assemble()
    xv = jnp.asarray(np.random.default_rng(1).standard_normal(V.ndof))
    y_mat = np.asarray(a.mat.ell().matvec(xv))
    y_op = np.asarray(op.matvec(xv))
    assert np.abs(y_mat - y_op).max() < 1e-12 * max(1e-30, np.abs(y_mat).max())


def test_operator_minres_stokes_saddle_point():
    """Matrix-free MINRES on the cut Stokes saddle-point system: the
    PartialAssemblyOperator composes with MinResSolver (abs-Jacobi
    preconditioner from the operator's exact diagonal) and reproduces the
    direct masked solve on the active dofs."""
    from ngsxfem_tpu import (
        CompoundBitArray, CoefficientFunction, FESpace, InnerProduct,
        LinearForm, Norm, SymbolicLFI, VectorH1, div,
    )
    from ngsxfem_tpu.solvers.krylov import MinResSolver

    mesh = MakeStructured2DMesh(quads=False, nx=8, ny=8,
                                mapping=lambda a, b: (2 * a - 1, 2 * b - 1))
    lsetp1 = GridFunction(H1(mesh, order=1))
    InterpolateToP1(sqrt(x * x + y * y) - 0.7, lsetp1)
    ci = CutInfo(mesh, lsetp1)
    hasneg = ci.GetElementsOfType(HASNEG)
    hasif = ci.GetElementsOfType(IF)
    V = VectorH1(mesh, order=2, dgjumps=True)
    Q = H1(mesh, order=1, dgjumps=True)
    X = FESpace([V, Q])
    (u, p), (v, q) = X.TnT()
    h = specialcf.mesh_size
    nl = 1.0 / Norm(grad(lsetp1)) * grad(lsetp1)
    lam = 160 / h
    ba = GetFacetsWithNeighborTypes(mesh, a=hasneg, b=hasif)
    ln = {"levelset": lsetp1, "domain_type": NEG}
    li = {"levelset": lsetp1, "domain_type": IF}
    a = BilinearForm(X)
    a += SymbolicBFI(ln, form=InnerProduct(grad(u), grad(v))
                     - div(v) * p - div(u) * q, definedonelements=hasneg)
    a += SymbolicBFI(li, form=-((grad(u) * nl) * v) - ((grad(v) * nl) * u)
                     + lam * (u * v) + p * (nl * v) + q * (nl * u))
    a += SymbolicFacetPatchBFI(
        form=1.0 / (h * h) * ((u - u.Other()) * (v - v.Other())),
        definedonelements=ba)
    a += SymbolicFacetPatchBFI(
        form=-0.1 * ((p - p.Other()) * (q - q.Other())),
        definedonelements=ba)
    a += SymbolicBFI(ln, form=-1e-8 * p * q, definedonelements=hasneg)
    fl = LinearForm(X)
    fl += SymbolicLFI(ln, form=CoefficientFunction((1.0, 0.5)) * v,
                      definedonelements=hasneg)
    a.Assemble()
    fl.Assemble()
    active = CompoundBitArray([GetDofsOfElements(V, hasneg),
                               GetDofsOfElements(Q, hasneg)])
    x_direct = np.asarray(a.mat.Inverse(active) * fl.vec.data)
    op = a.AssembleOperator()
    x_mr = np.asarray(
        MinResSolver(op, maxsteps=20000, tol=1e-12, freedofs=active)
        * np.asarray(fl.vec))
    m = np.asarray(active)
    rel = np.abs(x_direct - x_mr)[m].max() / max(
        1e-30, np.abs(x_direct)[m].max())
    assert rel < 1e-6, rel  # observed ~8e-9
