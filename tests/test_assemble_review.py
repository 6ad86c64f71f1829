"""Round-3 review regressions (forms/assemble + integrate pass):

1. Facet/BND/skeleton integrals under a SPACE-TIME deformation work (the
   tangent correction is evaluated per time point) and reduce to the
   stationary answer for a time-constant deformation.
2. levelset_domain dict options (time_order, force_intorder) are honored
   by SymbolicBFI/LFI like by Integrate.
3. Facet cut integrals reject combined domain types instead of silently
   assembling zero.
4. SymbolicLFI(dict) without form= raises the clear error.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from ngsxfem_tpu import (
    NEG, HASNEG, H1, VectorH1, BilinearForm, CoefficientFunction,
    GridFunction, InterpolateToP1, MakeStructured2DMesh, SymbolicBFI,
    SymbolicLFI, x, y,
)
from ngsxfem_tpu.spacetime import (
    ScalarTimeFE, SpaceTimeFESpace, SpaceTimeInterpolateToP1, tref,
)


def _skeleton_mass(mesh, deformation=None, time_order=-1):
    V = H1(mesh, order=1, dgjumps=True)
    u, v = V.TnT()
    a = BilinearForm(V)
    a += SymbolicBFI(form=u * v, skeleton=True, deformation=deformation,
                     time_order=time_order)
    a.Assemble()
    return np.asarray(a.mat.todense())


def test_skeleton_under_spacetime_deformation():
    mesh = MakeStructured2DMesh(quads=False, nx=3, ny=3)
    # stationary deformation reference
    Vd = VectorH1(mesh, order=1)
    dstat = GridFunction(Vd)
    dstat.Set(CoefficientFunction((0.2 * x * y, 0.0 * y)))
    A_stat = _skeleton_mass(mesh, deformation=dstat)

    # time-CONSTANT space-time deformation: same physical map at every t
    Wd = SpaceTimeFESpace(Vd, ScalarTimeFE(1))
    dst = GridFunction(Wd)
    nt = Wd.ndof_t
    dst._set_array(jnp.concatenate([dstat._arr] * nt))
    A_st = _skeleton_mass(mesh, deformation=dst, time_order=2)
    # the slab integral of a time-constant integrand == stationary * |I_t|=1
    assert np.abs(A_st - A_stat).max() < 1e-12, np.abs(A_st - A_stat).max()


def test_ld_dict_options_in_symbolic_bfi():
    mesh = MakeStructured2DMesh(quads=False, nx=3, ny=3)
    W = SpaceTimeFESpace(H1(mesh, order=1), ScalarTimeFE(1))
    lset = GridFunction(W)
    SpaceTimeInterpolateToP1(x - 0.3 - 0.4 * tref, tref, lset)
    u, v = W.TnT()

    def assemble(**kws):
        a = BilinearForm(W)
        ld = {"levelset": lset, "domain_type": NEG}
        ld.update(kws.pop("ld_extra", {}))
        a += SymbolicBFI(ld, form=u * v, **kws)
        a.Assemble()
        return np.asarray(a.mat.todense())

    A_kw = assemble(time_order=2)
    A_dict = assemble(ld_extra={"time_order": 2})
    assert np.abs(A_kw).max() > 0
    assert np.allclose(A_kw, A_dict, atol=1e-14)
    # without either, the space-time rule would not be built at all —
    # guard that the dict option genuinely changed the result
    with pytest.raises(Exception):
        assemble()  # ST levelset without time_order must not silently work


def test_facet_cut_force_intorder_from_dict():
    mesh = MakeStructured2DMesh(quads=False, nx=3, ny=3)
    V = H1(mesh, order=1, dgjumps=True)
    lset = GridFunction(H1(mesh, order=1))
    InterpolateToP1(x - 0.45, lset)
    u, v = V.TnT()

    def skel(**ld_extra):
        a = BilinearForm(V)
        a += SymbolicBFI({"levelset": lset, "domain_type": NEG, **ld_extra},
                         form=(x * x * x * x) * u * v, skeleton=True)
        a.Assemble()
        return np.asarray(a.mat.todense())

    A_low = skel(force_intorder=0)
    A_hi = skel(force_intorder=8)
    # x^4 integrand: order-0 facet rule is NOT exact -> results must differ
    assert np.abs(A_low - A_hi).max() > 1e-10


def test_facet_cut_combined_domain_type_raises():
    mesh = MakeStructured2DMesh(quads=False, nx=2, ny=2)
    V = H1(mesh, order=1, dgjumps=True)
    lset = GridFunction(H1(mesh, order=1))
    InterpolateToP1(x - 0.45, lset)
    u, v = V.TnT()
    a = BilinearForm(V)
    a += SymbolicBFI({"levelset": lset, "domain_type": HASNEG},
                     form=u * v, skeleton=True)
    with pytest.raises(ValueError):
        a.Assemble()


def test_symbolic_lfi_dict_guard():
    with pytest.raises(TypeError):
        SymbolicLFI({"levelset": None, "domain_type": NEG})
