"""Cut topology bookkeeping — CutInfo and the facet/element/dof set algebra.

Re-design of ``xfem/cutinfo.*`` (reference: CutInformation, Update at
``xfem/cutinfo.cpp:54-188``; facet/dof algebra ``:191-329``): element
classification is a batched sign reduction over level-set vertex values, cut
ratios come from the order-0 cut rule, and all mark sets are plain boolean
arrays (``BitArray``).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..domaintype import DOMAIN_TYPE, COMBINED_DOMAIN_TYPE, NEG, POS, IF, as_cdt
from ..fem.space import BitArray, _arr
from ..cf.coefficient import ElementValuesCF, FacetValuesCF
from ..ops.straightcut import cut_rule_element, eps_guard
from ..integrate import lset_vertex_values

VOL = "VOL"
BND = "BND"


@partial(jax.jit, static_argnames=("et",))
def _classify(et, vals):
    """One fused program: eps-guard, sign classification, order-0 cut ratios."""
    vg = eps_guard(vals)
    has_neg = jnp.any(vg < 0, axis=1)
    has_pos = jnp.any(vg > 0, axis=1)
    rule = cut_rule_element(et, vals, 0)
    wneg = jnp.sum(rule.w * (rule.side == 0), axis=1)
    wtot = jnp.sum(rule.w, axis=1)
    return has_neg, has_pos, wneg / wtot, vg


class CutInfo:
    """Per-mesh cut bookkeeping (cf. xfem/cutinfo.hpp:21-92)."""

    def __init__(self, mesh, levelset=None, time_order=-1):
        self.mesh = mesh
        self.dt_of_elem = None
        self.cut_ratio = None
        if levelset is not None:
            self.Update(levelset, time_order=time_order)

    def Update(self, levelset, time_order=-1, heapsize=None):
        mesh = self.mesh
        from ..spacetime.space import SpaceTimeFESpace

        if isinstance(getattr(levelset, "space", None), SpaceTimeFESpace):
            self._lset_gf = levelset
            return self._update_spacetime(levelset, time_order)
        from ..integrate import ensure_p1_levelset

        levelset = ensure_p1_levelset(levelset, mesh, cache_on=self)
        self._lset_gf = levelset
        vals = lset_vertex_values(levelset)
        has_neg_j, has_pos_j, ratio, vg = _classify(mesh.et, vals)
        has_neg, has_pos = np.asarray(has_neg_j), np.asarray(has_pos_j)
        dt = np.where(has_neg & has_pos, int(IF), np.where(has_neg, int(NEG), int(POS)))
        self.dt_of_elem = dt.astype(np.int8)
        self.cut_ratio = np.asarray(ratio)

        # vertex domain classification (dom_of_node analog, cutinfo.cpp:151-186)
        nv = mesh.nv
        vneg = np.zeros(nv, dtype=bool)
        vpos = np.zeros(nv, dtype=bool)
        vgn = np.asarray(vg)
        els = mesh.elements_np
        np.logical_or.at(vneg, els.ravel(), (vgn < 0).ravel())
        np.logical_or.at(vpos, els.ravel(), (vgn > 0).ravel())
        self.dt_of_vertex = np.where(
            vneg & vpos, int(IF), np.where(vneg, int(NEG), int(POS))
        ).astype(np.int8)

        # facet classification from its elements (used by facet set queries)
        f2e = mesh.facet2el_np
        dtl = self.dt_of_elem[f2e[:, 0]]
        dtr = np.where(f2e[:, 1] >= 0, self.dt_of_elem[np.maximum(f2e[:, 1], 0)], dtl)
        bits_l = np.left_shift(1, dtl.astype(np.int32))
        bits_r = np.left_shift(1, dtr.astype(np.int32))
        self.cdt_of_facet = (bits_l | bits_r).astype(np.int8)

        # boundary ("BND") element classification + ratios: the reference
        # Update loops VOL and BND (xfem/cutinfo.cpp:54-188); BND elements are
        # the boundary facets, classified by the codim-1 cut rule
        self._update_bnd(levelset)

    def _update_bnd(self, levelset):
        from ..mesh.mesh import FACET_ET
        from ..integrate import _p1_vertex_dofs

        mesh = self.mesh
        bf = mesh.boundary_facets_np
        if len(bf) == 0:
            self.dt_of_belem = np.zeros(0, dtype=np.int8)
            self.cut_ratio_bnd = np.zeros(0)
            return
        fverts = mesh.facets_np[bf]  # (B, nvf)
        vdofs = _p1_vertex_dofs(levelset.space)
        fvals = jnp.asarray(levelset._arr)[jnp.asarray(vdofs[fverts])]
        fet = FACET_ET[mesh.et]
        has_neg_j, has_pos_j, ratio, _ = _classify(fet, fvals)
        has_neg, has_pos = np.asarray(has_neg_j), np.asarray(has_pos_j)
        self.dt_of_belem = np.where(
            has_neg & has_pos, int(IF), np.where(has_neg, int(NEG), int(POS))
        ).astype(np.int8)
        self.cut_ratio_bnd = np.asarray(ratio)

    def _update_spacetime(self, levelset, time_order):
        """Space-time classification: an element is IF if it is cut at any
        time in the slab (sampled at time nodes + interior Gauss points,
        cf. reference cutinfo.cpp space-time ratios)."""
        from ..integrate import lset_st_vertex_values
        from ..ops.gauss import gauss_legendre_01

        mesh = self.mesh
        vals_st = np.asarray(lset_st_vertex_values(levelset))  # (E, ndt, nv)
        sp = levelset.space
        ts = np.concatenate([sp.tfe.nodes, gauss_legendre_01(max(2, sp.k_t + 1))[0]])
        Bt = sp.tfe.eval_np(ts)  # (nt, ndt)
        vals_t = np.einsum("tm,emv->etv", Bt, vals_st)  # (E, nt, nvel)
        # sign-COLLAPSING zero guard (same convention as ops eps_guard and
        # the reference, spacetimecutrule.cpp:132: |v|<1e-14 -> +1e-14), so
        # host classification agrees with the device rule kernels
        guard = np.where(np.abs(vals_t) < 1e-14, 1e-14, vals_t)
        has_neg = (guard < 0).any(axis=(1, 2))
        has_pos = (guard > 0).any(axis=(1, 2))
        dt = np.where(has_neg & has_pos, int(IF),
                      np.where(has_neg, int(NEG), int(POS)))
        self.dt_of_elem = dt.astype(np.int8)
        # space-time cut ratio from the order-0 space-time rule
        from ..ops.spacetimecut import spacetime_cut_rule

        rule = spacetime_cut_rule(
            mesh.et, jnp.asarray(vals_st), sp.k_t, 0,
            max(0, time_order) if time_order >= 0 else sp.k_t,
        )
        wneg = jnp.sum(rule.w * (rule.side == 0), axis=1)
        wtot = jnp.sum(rule.w, axis=1)
        self.cut_ratio = np.asarray(wneg / wtot)
        f2e = mesh.facet2el_np
        dtl = self.dt_of_elem[f2e[:, 0]]
        dtr = np.where(f2e[:, 1] >= 0, self.dt_of_elem[np.maximum(f2e[:, 1], 0)], dtl)
        self.cdt_of_facet = (
            np.left_shift(1, dtl.astype(np.int32))
            | np.left_shift(1, dtr.astype(np.int32))
        ).astype(np.int8)
        self.dt_of_vertex = None
        self.dt_of_belem = None
        self.cut_ratio_bnd = None

    # -- queries -------------------------------------------------------------
    def GetElementsOfType(self, dt=IF, VOL_or_BND=VOL) -> BitArray:
        cdt = int(as_cdt(dt))
        if VOL_or_BND != VOL:
            if getattr(self, "dt_of_belem", None) is None:
                raise NotImplementedError(
                    "BND element queries for space-time level sets")
            bits = np.left_shift(1, self.dt_of_belem.astype(np.int32))
            return BitArray((bits & cdt) == bits)
        bits = np.left_shift(1, self.dt_of_elem.astype(np.int32))
        return BitArray((bits & cdt) == bits)

    def GetFacetsOfType(self, dt=IF) -> BitArray:
        cdt = int(as_cdt(dt))
        # facet marked if its combined type is contained in the query mask
        return BitArray((self.cdt_of_facet & ~cdt) == 0)

    def GetCutRatios(self, VOL_or_BND=VOL):
        if VOL_or_BND != VOL:
            if getattr(self, "cut_ratio_bnd", None) is None:
                raise NotImplementedError(
                    "BND cut ratios for space-time level sets")
            return self.cut_ratio_bnd
        return self.cut_ratio

    def GetElementsWithThresholdContribution(self, dt=NEG, threshold=1.0):
        r = self.cut_ratio if int(dt) == int(NEG) else 1.0 - self.cut_ratio
        return BitArray(r >= threshold)


# -- facet / element set algebra (cf. xfem/cutinfo.cpp:191-329) -------------


def GetFacetsWithNeighborTypes(mesh, a, b=None, bnd_val_a=True, bnd_val_b=True,
                               use_and=True, ngsxfemcompat=True) -> BitArray:
    """Facets whose neighbor elements satisfy (a_left & b_right)|(b_left & a_right)
    (or the OR-version with use_and=False)."""
    a = _arr(a)
    b = a if b is None else _arr(b)
    f2e = mesh.facet2el_np
    e1 = f2e[:, 0]
    e2 = f2e[:, 1]
    interior = e2 >= 0
    a1 = a[e1]
    b1 = b[e1]
    a2 = np.where(interior, a[np.maximum(e2, 0)], bnd_val_a)
    b2 = np.where(interior, b[np.maximum(e2, 0)], bnd_val_b)
    # periodic boundary facets take their partner's element as the right
    # neighbor; only the lower-numbered facet of the pair is marked
    # (reference xfem/cutinfo.cpp:224-235 GetPeriodicFacet branch)
    pf = getattr(mesh, "periodic_facet_np", None)
    has_per = None
    if pf is not None and (pf >= 0).any():
        has_per = (~interior) & (pf >= 0)
        pe = f2e[np.maximum(pf, 0), 0]
        a2 = np.where(has_per, a[pe], a2)
        b2 = np.where(has_per, b[pe], b2)
    if use_and:
        out = (a1 & b2) | (b1 & a2)
    else:
        out = (a1 | b2) & (b1 | a2)
    if has_per is not None:
        out &= ~(has_per & (pf < np.arange(len(pf))))
    return BitArray(out)


def GetElementsWithNeighborFacets(mesh, facets) -> BitArray:
    f = _arr(facets)
    out = np.zeros(mesh.ne, dtype=bool)
    f2e = mesh.facet2el_np
    sel = np.nonzero(f)[0]
    for s in range(2):
        es = f2e[sel, s]
        out[es[es >= 0]] = True
    # marked periodic facet -> partner's element counts as a neighbor too
    pf = getattr(mesh, "periodic_facet_np", None)
    if pf is not None and len(sel):
        partners = pf[sel]
        pp = partners[partners >= 0]
        if len(pp):
            out[f2e[pp, 0]] = True
    return BitArray(out)


def GetDofsOfFacets(space, facet_mask) -> BitArray:
    """Dofs associated with marked facets (xfem/cutinfo.cpp:306-329)."""
    from ..fem.facetspace import GetDofsOfFacets as _impl

    return _impl(space, facet_mask)


def IndicatorCF(mesh, ba, facets=False):
    """1 on marked elements/facets else 0 (python/__init__.py:380)."""
    vals = _arr(ba).astype(np.float64)
    if facets:
        return FacetValuesCF(vals, mesh)
    return ElementValuesCF(vals, mesh)


def CutRatioGF(cutinfo: CutInfo):
    """Element-wise cut ratio CF (python/__init__.py:397)."""
    return ElementValuesCF(cutinfo.cut_ratio, cutinfo.mesh)


def BitArrayCF(ba, mesh=None):
    """CF = 1 on marked elements else 0 (utils/bitarraycf.hpp:10-21)."""
    return ElementValuesCF(_arr(ba).astype(np.float64), mesh)
