"""Mixed-element-type (quad-dominated) meshes: the composite layer
(VERDICT r2 missing item 5; reference: Netgen quad_dominated=True meshes,
tests/pytests/test_backuprule.py:15, py_tutorials/cutfem.py:82-85)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from ngsxfem_tpu import (
    NEG, POS, IF, HASNEG, x, y, sqrt, CoefficientFunction, grad, specialcf,
    MakeQuadDominated2DMesh, CompositeGridFunction, CompositeCutInfo,
    CompositeBilinearForm, CompositeLinearForm, IntegrateC, BilinearForm,
    LinearForm, SymbolicBFI, SymbolicLFI, Norm, GetDofsOfElements, BitArray,
)


def test_quad_dominated_mesh_build():
    cm = MakeQuadDominated2DMesh(nx=10, ny=10, trig_band=0.4)
    ets = {m.et for m in cm.submeshes}
    assert ets == {"quad", "trig"}
    assert cm.ne == 6 * 10 + 2 * 4 * 10  # 60 quads + 80 trigs
    assert abs(IntegrateC(None, 1.0, cm, order=2) - 1.0) < 1e-13


def test_quad_dominated_cut_exactness():
    """Linear level set crossing BOTH groups: NEG area and IF length exact
    (the straight-cut exactness contract on a mixed mesh)."""
    cm = MakeQuadDominated2DMesh(nx=8, ny=8, trig_band=0.5)
    lset = CompositeGridFunction(cm).Set(x + y - 0.8)  # crosses trig region
    a = IntegrateC({"levelset": lset, "domain_type": NEG}, 1.0, cm, order=2)
    iflen = IntegrateC({"levelset": lset, "domain_type": IF}, 1.0, cm,
                       order=2)
    assert abs(a - 0.32) < 1e-13          # triangle area 0.8^2/2
    assert abs(iflen - 0.8 * np.sqrt(2)) < 1e-13

    lset2 = CompositeGridFunction(cm).Set(x - 0.75)  # crosses quad region
    a2 = IntegrateC({"levelset": lset2, "domain_type": NEG}, 1.0, cm, order=2)
    assert abs(a2 - 0.75) < 1e-13


def test_quad_dominated_circle_eoc():
    errs = []
    for nx in (8, 16, 32):
        cm = MakeQuadDominated2DMesh(nx=nx, ny=nx, trig_band=0.5)
        lset = CompositeGridFunction(cm).Set(
            sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2) - 0.3)
        a = IntegrateC({"levelset": lset, "domain_type": NEG}, 1.0, cm,
                       order=3)
        errs.append(abs(a - np.pi * 0.09))
    eocs = [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    assert np.mean(eocs) > 1.6, (errs, eocs)


def test_quad_dominated_fictdom_solve():
    """Unfitted fictitious-domain Poisson assembled ACROSS the mixed groups
    into the shared vertex dofs; direct solve; sanity on the solution."""
    cm = MakeQuadDominated2DMesh(nx=12, ny=12, trig_band=0.5)
    lset = CompositeGridFunction(cm).Set(
        sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2) - 0.35)
    ci = CompositeCutInfo(cm, lset)
    hasneg_pg = ci.per_group(HASNEG)

    space = CompositeGridFunction(cm)  # the P1 composite "FESpace"

    def make_a(V, k):
        u, v = V.TnT()
        h = specialcf.mesh_size
        nl = 1.0 / Norm(grad(lset.gfs[k])) * grad(lset.gfs[k])
        ld_neg = {"levelset": lset.gfs[k], "domain_type": NEG}
        ld_if = {"levelset": lset.gfs[k], "domain_type": IF}
        a = BilinearForm(V)
        a += SymbolicBFI(ld_neg, form=grad(u) * grad(v),
                         definedonelements=hasneg_pg[k])
        a += SymbolicBFI(ld_if, form=-(grad(u) * nl) * v - (grad(v) * nl) * u
                         + 40.0 / h * u * v)
        return a

    def make_f(V, k):
        _, v = V.TnT()
        f = LinearForm(V)
        f += SymbolicLFI({"levelset": lset.gfs[k], "domain_type": NEG},
                         form=v, definedonelements=hasneg_pg[k])
        return f

    A = CompositeBilinearForm(space, make_a).Assemble()
    F = CompositeLinearForm(space, make_f).Assemble()

    # active global dofs: vertices of HASNEG elements in any group
    act = np.zeros(cm.nv, dtype=bool)
    for k, m in enumerate(cm.submeshes):
        hn = np.asarray(hasneg_pg[k].np)
        act[m.elements_np[hn].ravel()] = True

    u = A.mat.Inverse(freedofs=BitArray(act)) * F._vec
    u = np.asarray(u)
    assert np.all(np.isfinite(u))
    # u > 0 inside the disc (discrete max principle-ish sanity), u ~ exact
    # radial solution (R^2 - r^2)/4 at the center: 0.35^2/4 = 0.0306
    vid_center = np.argmin(np.linalg.norm(cm.vertices_np - 0.5, axis=1))
    assert abs(u[vid_center] - 0.35 ** 2 / 4) < 5e-3, u[vid_center]
    # solution decays to ~0 at the implicit boundary
    r = np.linalg.norm(cm.vertices_np - 0.5, axis=1)
    ring = act & (np.abs(r - 0.35) < 0.05)
    assert np.abs(u[ring]).max() < 2e-2
