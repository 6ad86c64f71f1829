"""Round-3 review regressions (fem/lsetcurv/geom/integrate pass):

1. GridFunction evaluation on masked spaces (Compress/XFE placeholder-0
   el2dof slots) zeroes inactive slots — values AND gradients.
2. GetDofsOfElements on VectorFESpace-over-Compress honors the validity
   mask (no spurious dof 0).
3. FacetFESpace's on-facet test survives float32 (dtype-scaled tolerance).
4. Compress(FacetFESpace) constructs and assembles.
5. LevelSetMeshAdaptation(periodic=True) unifies deformation dofs across
   the seam with unchanged geometric accuracy.
6. The space-time CutInfo zero-guard preserves signs (grazing-negative
   elements stay NEG).
7. Repeated Integrate with the SAME raw-CF level set reuses one compiled
   program (P1 interpolant cached on the CF).
"""
import math
import os
import sys
import warnings

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from ngsxfem_tpu import (
    NEG, POS, IF, H1, BilinearForm, BitArray, Compress, GridFunction,
    InterpolateToP1, Integrate, MakeStructured2DMesh, SymbolicBFI,
    GetDofsOfElements, grad as Grad, sin, sqrt, x, y,
)
from ngsxfem_tpu.fem.space import VectorFESpace


def _band_setup():
    mesh = MakeStructured2DMesh(quads=False, nx=4, ny=4)
    V = H1(mesh, order=1)
    act = np.zeros(V.ndof, bool)
    act[V.el2dof_np[:4].ravel()] = True  # active only on the first elements
    Vc = Compress(V, BitArray(act))
    return mesh, V, act, Vc


def test_compressed_gf_eval_masked():
    mesh, V, act, Vc = _band_setup()
    gf = GridFunction(Vc)
    gf._set_array(jnp.ones(Vc.ndof))  # constant 1 ON the active band
    # integrate gf over the WHOLE mesh: inactive elements contribute the
    # partition-of-unity of their VALID slots only (0 on fully-inactive)
    full = Integrate(cf=gf, mesh=mesh, order=2)
    active_elem = (V.el2dof_np[:, :] >= 0).all(axis=1) & act[
        V.el2dof_np].all(axis=1)
    # elements with NO active dof must contribute exactly 0:
    # evaluate on one such element directly
    from ngsxfem_tpu.cf.context import EvalCtx, eval_pure

    dead = np.nonzero(~act[V.el2dof_np].any(axis=1))[0]
    assert len(dead) > 0
    pts = jnp.full((len(dead), 1, 2), 0.25)
    ctx = EvalCtx(mesh, pts, elem_ids=jnp.asarray(dead))
    vals = np.asarray(eval_pure(gf, ctx))
    assert np.allclose(vals, 0.0), vals.max()
    gvals = np.asarray(eval_pure(Grad(gf), ctx))
    assert np.allclose(gvals, 0.0), np.abs(gvals).max()
    assert full < mesh.ne  # sanity: strictly less than the all-one integral


def test_getdofs_vector_over_compress():
    mesh, V, act, Vc = _band_setup()
    W = VectorFESpace(Vc)
    mask = np.zeros(mesh.ne, bool)
    dead = np.nonzero(~act[V.el2dof_np].any(axis=1))[0]
    mask[dead[0]] = True  # a fully-inactive element
    got = GetDofsOfElements(W, BitArray(mask)).a
    assert not got.any(), np.nonzero(got)  # previously dof 0 leaked in


def test_facetspace_f32_tolerance():
    from ngsxfem_tpu.fem.facetspace import FacetFESpace

    mesh = MakeStructured2DMesh(quads=False, nx=3, ny=3)
    F = FacetFESpace(mesh, order=1)
    u, v = F.TnT()
    a = BilinearForm(F)
    a += SymbolicBFI(form=u * v, element_boundary=True)
    a.Assemble()
    A64 = np.asarray(a.mat.todense())
    assert np.abs(A64).max() > 0
    # same assembly with float32 geometry: the on-facet test must not
    # silently mask the whole basis to zero
    from ngsxfem_tpu.forms.evaluate import Factor  # noqa: F401 (import path)
    from ngsxfem_tpu.cf.context import EvalCtx

    pts = jnp.asarray(np.random.default_rng(0).random((mesh.ne, 4, 2)),
                      dtype=jnp.float32)
    # evaluate the facet basis hook directly at f32 element-boundary points:
    # take the reference points of facet 0 (s in [0,1] along the edge)
    fr = jnp.asarray([[0.25, 0.0], [0.75, 0.0]], dtype=jnp.float32)
    pctx = EvalCtx(mesh, jnp.broadcast_to(fr, (mesh.ne, 2, 2)).astype(
        jnp.float32))

    class P:  # minimal proxy stub
        op = "val"
        block_key = ("f", 0)
        space = F

    f = F.proxy_factor_hook(P(), None, pctx)
    arr = np.asarray(f.arr)
    assert np.abs(arr).max() > 0.4, np.abs(arr).max()


def test_compress_facetspace():
    from ngsxfem_tpu.fem.facetspace import FacetFESpace, GetDofsOfFacets

    mesh = MakeStructured2DMesh(quads=False, nx=3, ny=3)
    F = FacetFESpace(mesh, order=1)
    fmask = np.zeros(mesh.nfacets, bool)
    fmask[mesh.facet2el_np[:, 1] >= 0] = True  # interior facets
    active = GetDofsOfFacets(F, BitArray(fmask))
    Fc = Compress(F, active)
    assert Fc.ndof == int(active.a.sum())
    u, v = Fc.TnT()
    a = BilinearForm(Fc)
    a += SymbolicBFI(form=u * v, element_boundary=True)
    a.Assemble()
    A = np.asarray(a.mat.todense())
    assert np.abs(A).max() > 0
    assert (np.abs(A).sum(axis=1) > 1e-12).all()  # no dead rows


def test_lsetcurv_periodic_unifies_dofs():
    from ngsxfem_tpu import LevelSetMeshAdaptation

    mesh = MakeStructured2DMesh(quads=False, nx=8, ny=8, periodic="x")
    phi = y - 0.5 - 0.1 * sin(2 * math.pi * x)
    lsa = LevelSetMeshAdaptation(mesh, order=2, periodic=True)
    lsa.CalcDeformation(phi)
    assert lsa.deform_space.ndof < 2 * lsa.ho_space.ndof  # seam unified
    d = lsa.CalcMaxDistance(phi)
    lsa0 = LevelSetMeshAdaptation(mesh, order=2)
    lsa0.CalcDeformation(phi)
    d0 = lsa0.CalcMaxDistance(phi)
    assert d < 5e-3 and abs(d - d0) < 5e-4, (d, d0)


def test_st_cutinfo_guard_reference_collapse():
    """The space-time classification guard is sign-COLLAPSING like the
    reference (spacetimecutrule.cpp:132: |v|<1e-14 -> +1e-14): a grazing
    node at -5e-15 counts as POSITIVE, so the touching elements classify
    IF — with a measure-zero POS sliver, so integrals are unaffected."""
    from ngsxfem_tpu import CutInfo, HASNEG
    from ngsxfem_tpu.spacetime import ScalarTimeFE, SpaceTimeFESpace

    mesh = MakeStructured2DMesh(quads=False, nx=2, ny=2)
    W = SpaceTimeFESpace(H1(mesh, order=1), ScalarTimeFE(1))
    lset = GridFunction(W)
    # strictly negative level set grazing zero at one node
    arr = np.full(W.ndof, -1.0)
    arr[0] = -5e-15
    lset._set_array(jnp.asarray(arr))
    ci = CutInfo(mesh, lset, time_order=2)
    neg = ci.GetElementsOfType(NEG).a
    hasneg = ci.GetElementsOfType(HASNEG).a
    assert hasneg.all(), "grazing element lost its NEG bulk"
    assert neg.sum() + ci.GetElementsOfType(IF).a.sum() == mesh.ne
    # the POS sliver carries no measure: NEG volume == full domain
    vol = Integrate(levelset_domain={"levelset": lset, "domain_type": NEG,
                                     "time_order": 2},
                    cf=1.0, mesh=mesh, order=2)
    assert abs(vol - 1.0) < 1e-10, vol


def test_raw_cf_levelset_integrate_reuses_jit():
    from ngsxfem_tpu.integrate import _INT_CACHE

    mesh = MakeStructured2DMesh(quads=False, nx=4, ny=4)
    phi = sqrt(x * x + y * y) - 0.5  # raw CF, not a P1 GridFunction
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        v1 = Integrate(levelset_domain={"levelset": phi, "domain_type": NEG},
                       cf=1.0, mesh=mesh, order=1)
        n1 = len(_INT_CACHE._d)
        v2 = Integrate(levelset_domain={"levelset": phi, "domain_type": NEG},
                       cf=1.0, mesh=mesh, order=1)
        n2 = len(_INT_CACHE._d)
    assert v1 == v2
    assert n2 == n1, "second Integrate with the same CF recompiled"
