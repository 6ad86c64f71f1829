"""Reference-API parity surface for the multigrid/lsetcurving layers:
free-function ProjectShift/CalcMaxDistance/CalcDistances
(lsetcurving/python_lsetcurving.cpp:49-136), patch-block helpers +
P2TwoGridCL (python/cutmg.py:221-331), prolongation classes
(utils/xprolongation.hpp:13-101)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from ngsxfem_tpu import *  # noqa: F403
from ngsxfem_tpu.solvers.mg import prolongation_matrix


def _sq_mesh(nx):
    return MakeStructured2DMesh(
        quads=False, nx=nx, ny=nx,
        mapping=lambda a, b: (2 * a - 1, 2 * b - 1))


def _cut_problem(mesh, order):
    levelset = sqrt(x * x + y * y) - 0.6
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
    a += SymbolicBFI(lset_neg, form=grad(u) * grad(v),
                     definedonelements=hasneg)
    a += SymbolicBFI(lset_if, form=-(grad(u) * n_lset) * v
                     - (grad(v) * n_lset) * u + 20.0 * order * order / h * u * v)
    a += SymbolicFacetPatchBFI(
        form=0.5 / (h * h) * (u - u.Other()) * (v - v.Other()),
        definedonelements=ba_facets)
    a.Assemble()
    f = LinearForm(Vh)
    f += SymbolicLFI(lset_neg, form=CoefficientFunction(1.0) * v,
                     definedonelements=hasneg)
    f.Assemble()
    active = GetDofsOfElements(Vh, hasneg)
    return Vh, ci, a.mat, f._vec, active


def test_patch_blocks_cover_free_dofs():
    mesh = _sq_mesh(6)
    Vh, ci, A, b, active = _cut_problem(mesh, order=2)
    for blocks in (VertPatches(Vh, mesh), ElemPatches(Vh),
                   EdgePatches(Vh, mesh)):
        got = set()
        for blk in blocks:
            got |= set(int(d) for d in blk)
        free = np.nonzero(np.asarray(Vh.FreeDofs().np))[0]
        assert set(free) <= got


def test_block_smoother_reduces_residual():
    mesh = _sq_mesh(6)
    Vh, ci, A, b, active = _cut_problem(mesh, order=2)
    blocks = EdgePatches(Vh, mesh)
    sm = CutFemSmoother(A, freedofs=active, blocks=blocks,
                        if_correction=False)
    fm = jnp.asarray(np.asarray(active.np))
    bm = jnp.where(fm, jnp.asarray(b), 0.0)
    x = sm.smooth(jnp.zeros_like(bm), bm, steps=6)
    r0 = float(jnp.linalg.norm(bm))
    r = float(jnp.linalg.norm(jnp.where(fm, bm - A.matvec(x), 0.0)))
    assert r < 0.5 * r0, (r, r0)


def test_p2twogrid_solves():
    mesh = _sq_mesh(8)
    V2, ci, A2, b2, act2 = _cut_problem(mesh, order=2)
    V1, ci1, A1, b1, act1 = _cut_problem(mesh, order=1)
    coarse_inv = A1.Inverse(freedofs=act1)
    tg = P2TwoGridCL(a=A2, fes=V2, mesh=mesh, ci=ci,
                     ifsolver="cg", linmgiter=lambda r: coarse_inv * r,
                     coarse_space=V1, patchtype="edge",
                     nu=2, maxit=30, tol=1e-8)
    # P2TwoGridCL uses V2.FreeDofs(); restrict further to active cut dofs
    tg.free = jnp.asarray(np.asarray(act2.np))
    x = tg.Mult(jnp.asarray(b2))
    fm = jnp.asarray(np.asarray(act2.np))
    r = float(jnp.linalg.norm(jnp.where(fm, jnp.asarray(b2) - A2.matvec(x),
                                        0.0)))
    nb = float(jnp.linalg.norm(jnp.where(fm, jnp.asarray(b2), 0.0)))
    assert r < 1e-6 * nb, (r, nb)


def test_prolongation_classes_match_matrix():
    m1, m2 = _sq_mesh(4), _sq_mesh(8)
    V1, V2 = H1(m1, order=1), H1(m2, order=1)
    prol = P1Prolongation(m1)
    prol.Update(V1)
    prol.Update(V2)
    P = prolongation_matrix(V1, V2)
    xc = jnp.asarray(np.random.default_rng(0).normal(size=V1.ndof))
    assert np.allclose(prol.Prolongate(1, xc), P.matvec(xc))
    xf = jnp.asarray(np.random.default_rng(1).normal(size=V2.ndof))
    assert np.allclose(prol.Restrict(1, xf), P.T.matvec(xf))
    # matrix protocol (drop-in for MultiGridCL)
    assert np.allclose(prol.matvec(xc), P.matvec(xc))


def test_compound_prolongation_reference_style():
    m1, m2 = _sq_mesh(4), _sq_mesh(8)
    W1 = FESpace([H1(m1, order=1), H1(m1, order=1)])
    W2 = FESpace([H1(m2, order=1), H1(m2, order=1)])
    cp = CompoundProlongation(W1)
    cp.AddProlongation(P1Prolongation(m1))
    cp.AddProlongation(P1Prolongation(m1))
    cp.Update(W1)
    cp.Update(W2)
    P = prolongation_matrix(H1(m1, order=1), H1(m2, order=1))
    xc = np.random.default_rng(2).normal(size=W1.ndof)
    got = np.asarray(cp.Prolongate(1, jnp.asarray(xc)))
    n1 = W1.components[0].ndof
    assert np.allclose(got[:P.shape[0]], np.asarray(P.matvec(jnp.asarray(xc[:n1]))))
    assert np.allclose(got[P.shape[0]:], np.asarray(P.matvec(jnp.asarray(xc[n1:]))))


def test_projectshift_free_function_matches_class():
    mesh = _sq_mesh(8)
    levelset = sqrt(x * x + y * y) - 0.6
    la = LevelSetMeshAdaptation(mesh, order=2, threshold=0.5)
    la.CalcDeformation(levelset)

    lset_ho = GridFunction(H1(mesh, order=2))
    lset_ho.Set(levelset)
    lset_p1 = GridFunction(H1(mesh, order=1))
    InterpolateToP1(lset_ho, lset_p1)
    deform = GridFunction(VectorH1(mesh, order=2))
    ProjectShift(lset_ho, lset_p1, deform, threshold=0.5)
    assert np.allclose(np.asarray(deform._arr), np.asarray(la.deform._arr),
                       atol=1e-12)

    # free-function distance measures agree with the class methods when
    # given the same levelset argument (the class defaults to the exact CF,
    # the free binding takes whatever is passed — reference semantics)
    d_free = CalcMaxDistance(levelset, lset_p1, deform)
    d_cls = la.CalcMaxDistance()
    assert abs(d_free - d_cls) < 1e-12 + 1e-8 * abs(d_cls)
    mx, l1, l2 = CalcDistances(levelset, lset_p1, deform)
    assert abs(mx - d_cls) < 1e-12 + 1e-8 * abs(d_cls)
    assert 0 < l1 <= mx and 0 < l2 <= mx
    # with the HO interpolant instead, the distance is the (larger)
    # interpolation-limited one but still O(h^{order+1})-small
    d_gf = CalcMaxDistance(lset_ho, lset_p1, deform)
    assert d_gf < 0.05


def test_cxx_class_name_aliases():
    assert CXFESpace is XFESpace
    assert CSpaceTimeFESpace is SpaceTimeFESpace
