"""Integrals, BilinearForm/LinearForm and batched assembly.

Replaces the reference's symbolic cut integrators
(``xfem/symboliccutbfi.*``, ``xfem/symboliccutlfi.*``,
``utils/restrictedblf.*``): each integral is assembled for ALL (marked)
elements at once — cut-rule tensors -> jet evaluation -> per-term einsum
B·D·Bᵀ -> COO scatter.  Sparsity restriction (RestrictedBilinearForm) is
implicit: only assembled entries exist.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import config
from ..domaintype import DOMAIN_TYPE, NEG, POS, IF
from ..cf.coefficient import CF, wrap
from ..cf.context import EvalCtx
from ..integrate import _cut_ctx_and_weights, normalize_levelset_domain
from ..ops.gauss import reference_rule
from ..fem.space import (
    FESpace, CompoundFESpace, CompressedFESpace, VectorFESpace, BitArray, _arr,
)
from ..solvers.sparse import SparseMatrix
from .evaluate import eval_form
from .proxies import ProxyFunction

VOL = "VOL"
BND = "BND"


class Integral:
    def __init__(self, form, levelset_domain=None, definedonelements=None,
                 element_boundary=False, skeleton=False, facet_patch=False,
                 force_intorder=-1, deformation=None, time_order=-1,
                 vb=VOL):
        self.form = wrap(form)
        self.levelset_domain = (
            normalize_levelset_domain(levelset_domain) if levelset_domain else None
        )
        self.definedonelements = (
            None if definedonelements is None else _arr(definedonelements).copy()
        )
        self.element_boundary = element_boundary
        self.skeleton = skeleton
        self.facet_patch = facet_patch
        self.force_intorder = force_intorder
        self.deformation = deformation
        # dict-carried options (Integrate convention) apply here too, so an
        # ld ported verbatim keeps its space-time / forced-order semantics
        if self.levelset_domain is not None:
            if time_order < 0:
                time_order = int(self.levelset_domain.get("time_order", -1))
            if force_intorder < 0:
                self.force_intorder = int(
                    self.levelset_domain.get("force_intorder", -1))
        self.time_order = time_order

        if vb not in (VOL, BND):
            raise NotImplementedError(
                f"VOL_or_BND={vb!r} integrals are not supported; "
                "an unsupported option must not silently assemble as VOL"
            )
        if vb == BND and (element_boundary or skeleton or facet_patch):
            raise NotImplementedError(
                "VOL_or_BND=BND cannot be combined with element_boundary/"
                "skeleton/facet_patch integrals"
            )
        self.vb = vb

    def SetDefinedOnElements(self, ba):
        """Re-mark this integral's element/facet selection (reference API:
        ``Integrator::SetDefinedOnElements``, used in the per-slab
        re-marking loop of ``tests/pytests/test_spacetimecutrule.py:303-306``).

        Selections are dynamic capacity-padded jit inputs here, so re-marking
        reuses the compiled assembly program (no recompilation) as long as the
        new mark count fits the signature-time capacity bucket."""
        self.definedonelements = _arr(ba).copy()


def SymbolicBFI(levelset_domain=None, form=None, VOL_or_BND=VOL, element_boundary=False,
                skeleton=False, definedonelements=None, deformation=None,
                force_intorder=-1, time_order=-1, **kw):
    """Cut/standard bilinear integrator descriptor (python/__init__.py:108)."""
    if form is None:  # allow SymbolicBFI(form) positional
        form, levelset_domain = levelset_domain, None
        if isinstance(form, dict):
            raise TypeError("SymbolicBFI needs form=...")
    return Integral(form, levelset_domain=levelset_domain,
                    definedonelements=definedonelements,
                    element_boundary=element_boundary, skeleton=skeleton,
                    force_intorder=force_intorder, deformation=deformation,
                    time_order=time_order, vb=VOL_or_BND)


def SymbolicLFI(levelset_domain=None, form=None, VOL_or_BND=VOL, definedonelements=None,
                deformation=None, force_intorder=-1, time_order=-1, **kw):
    if form is None:  # allow SymbolicLFI(form) positional
        form, levelset_domain = levelset_domain, None
        if isinstance(form, dict):
            raise TypeError("SymbolicLFI needs form=...")
    return Integral(form, levelset_domain=levelset_domain,
                    definedonelements=definedonelements,
                    force_intorder=force_intorder, deformation=deformation,
                    time_order=time_order, vb=VOL_or_BND)


def SymbolicFacetPatchBFI(form=None, skeleton=False, definedonelements=None,
                          force_intorder=-1, time_order=-1, deformation=None,
                          **kw):
    """Facet-patch (volumetric ghost penalty) integrator
    (xfem/symboliccutbfi.cpp:1104-1413)."""
    if skeleton:
        raise NotImplementedError("skeleton=True facet integrals: use SymbolicBFI")
    return Integral(form, facet_patch=True, definedonelements=definedonelements,
                    force_intorder=force_intorder, time_order=time_order,
                    deformation=deformation)


# ---------------------------------------------------------------------------


def _ensure_p1_ld(integral: Integral, mesh):
    """Route a non-P1 level set of an integral to P1 (CF fallback,
    cf. reference CF2GFForStraightCutRule, cutint/xintegration.cpp:91-103).

    The ORIGINAL level set is kept in the dict (``_orig_levelset``) so every
    Assemble re-interpolates it into the cached P1 target — the reference
    re-evaluates CF2GFForStraightCutRule per assembly, so an updated
    high-order/parametric level set must not reuse stale P1 geometry."""
    if integral.levelset_domain is None:
        return
    from ..integrate import ensure_p1_levelset

    ld = integral.levelset_domain
    if ld["subdivlvl"] > 0:
        # subdivision path: the level set stays a genuine CF (legacy-engine
        # semantics, cutint/xintegration.cpp:698+); only volume integrals
        # support it
        if (integral.element_boundary or integral.skeleton
                or integral.facet_patch or integral.vb == BND):
            raise NotImplementedError(
                "subdivlvl>0 is only supported for volume cut integrals; "
                "facet/boundary integrators use the straight-cut rule "
                "(as the reference does)")
        return
    orig = ld.get("_orig_levelset", ld["levelset"])
    p1 = ensure_p1_levelset(orig, mesh, cache_on=integral)
    if p1 is not orig:
        ld["_orig_levelset"] = orig
    ld["levelset"] = p1


def _space_order(space):
    if isinstance(space, CompoundFESpace):
        return max(s.order for s in space.components)
    return space.order


def _block_space(space, blk):
    return space.components[blk] if isinstance(space, CompoundFESpace) else space


def _block_offset(space, blk):
    return int(space.offsets[blk]) if isinstance(space, CompoundFESpace) else 0


def block_dofmap(space, block_key, elem_ids_self, elem_ids_other=None):
    """Global dof columns (E, ndl_total) for a factor block."""
    blk, other = block_key
    sp = _block_space(space, blk)
    off = _block_offset(space, blk)
    eids = elem_ids_other if other else elem_ids_self
    if eids is None:
        e2d = sp.el2dof_np
    else:
        e2d = sp.el2dof_np[np.asarray(eids)]
    if isinstance(sp, VectorFESpace):
        maps = [c * sp.nscal + e2d for c in range(sp.vdim)]
        e2d = np.concatenate(maps, axis=1)
    return e2d + off  # host numpy (scatter structure is static)


def _volume_ctx(integral: Integral, mesh, order, dyn=None):
    """(ctx, w_phys (E,Q), valid mask) for a volume-type integral."""
    deform = (integral.deformation if integral.deformation is not None
              else "inherit")
    if integral.levelset_domain is not None:
        ld = integral.levelset_domain
        o = order if ld["force_intorder"] < 0 else ld["force_intorder"]
        if integral.force_intorder >= 0:
            o = integral.force_intorder
        ctx, w_phys, mask = _cut_ctx_and_weights(
            mesh, ld["levelset"], ld["domain_type"], o, dyn=dyn,
            time_order=integral.time_order,
            quad_dir_policy=ld["quad_dir_policy"],
            deformation=deform,
            subdivlvl=ld["subdivlvl"],
        )
    else:
        o = order if integral.force_intorder < 0 else integral.force_intorder
        rp, rw = reference_rule(mesh.et, o)
        E = mesh.ne
        pts = jnp.broadcast_to(jnp.asarray(rp, dtype=config.dtype)[None], (E,) + rp.shape)
        rwq = jnp.asarray(rw, dtype=config.dtype)[None, :]
        times = None
        if integral.time_order >= 0:
            # plain space-time volume rule: spatial rule x time Gauss
            from ..ops.gauss import gauss_legendre_01

            tg, tw = gauss_legendre_01(max(1, (integral.time_order + 2) // 2))
            tg = jnp.asarray(tg, dtype=config.dtype)
            tw = jnp.asarray(tw, dtype=config.dtype)
            nt = tg.shape[0]
            Q = pts.shape[1]
            pts = jnp.repeat(pts, nt, axis=1)
            rwq = (rwq[:, :, None] * tw[None, None, :]).reshape(1, Q * nt)
            times = jnp.broadcast_to(tg[None, None, :], (E, Q, nt)).reshape(
                E, Q * nt)
        ctx = EvalCtx(mesh, pts, dyn=dyn, deformation=deform, time=times)
        w_phys = rwq * jnp.abs(ctx.detJ)
        mask = jnp.ones(w_phys.shape, dtype=bool)
    if integral.definedonelements is not None:
        # dynamic element mask: re-marking (moving domains) needs no recompile
        from ..jitcache import dyn_get

        sel_arr = dyn_get(dyn, integral, "mask",
                          jnp.asarray(integral.definedonelements))
        sel = sel_arr[:, None]
        mask = mask & sel
        w_phys = jnp.where(sel, w_phys, 0.0)
    return ctx, w_phys, mask


def _cut_capacity(lgf):
    """Host-side cut-element count of a P1 level set, bucketed to the next
    power of two (>=64) so the compiled signature survives a moving level
    set until the cut count doubles.

    The count needs a device->host read of the dof vector; since arrays are
    functional, the result is cached on the GridFunction keyed by the
    current vector OBJECT — repeated Integrate/Assemble calls with an
    unchanged level set pay zero extra D2H syncs."""
    import math

    cached = getattr(lgf, "_cutcap_cache", None)
    if cached is not None and cached[0] is lgf._arr:
        return cached[1]

    sp = lgf.space
    from ..integrate import vertex_local_ids

    vperm = vertex_local_ids(sp.mesh.et, 1)
    vals = np.asarray(lgf._arr)[sp.el2dof_np[:, vperm]]
    # match the device predicate (two_tier_tiers runs eps_guard, which maps
    # exact zeros to +eps): a vertex value of 0 counts as POSITIVE here,
    # otherwise the host capacity undercounts and the overflow NaN poison
    # fires on valid inputs (level set vanishing exactly on vertices)
    ncut = int(((vals < 0).any(1) & (vals >= 0).any(1)).sum())
    cap = 1 << max(6, math.ceil(math.log2(max(1, int(ncut * 1.3) + 16))))
    lgf._cutcap_cache = (lgf._arr, cap)
    return cap


def _two_tier_applicable(integral: Integral, mesh):
    from ..spacetime.space import SpaceTimeFESpace

    return (config.two_tier_assembly
            and integral.levelset_domain is not None
            and integral.levelset_domain["subdivlvl"] == 0
            and integral.time_order < 0
            and not isinstance(integral.levelset_domain["levelset"].space,
                               SpaceTimeFESpace))


def _volume_tiers(integral: Integral, mesh, order, dyn=None):
    """Quadrature tiers [(ctx, w_phys (R,Q), mask, scatter_ids)] of a
    volume-type integral; scatter_ids None => rows are all elements, else a
    fixed-capacity compaction of cut elements (pad slots zero-weighted).

    Two-tier cut assembly (the hand-written flagship model's
    ``elmats_compact`` design, models/poisson.py:230-290, promoted into the
    public path): NEG/POS integrals run the cheap standard rule over ALL
    elements, weight-masked to matching uncut elements, and the full cut
    kernel only on the compacted cut set; IF integrals are purely compacted.
    The expensive path then scales with the interface, not the volume
    (reference cost model: per-element rule construction in
    ``cutint/python_cutint.cpp:46-69`` pays the cut path only on cut
    elements).  Capacity overflow (level set moved, cut count grew past the
    signature bucket before re-signature) poisons the weights with NaN —
    loud, never silently wrong.
    """
    if not _two_tier_applicable(integral, mesh):
        ctx, w, mask = _volume_ctx(integral, mesh, order, dyn=dyn)
        return [(ctx, w, mask, None)]

    from ..integrate import two_tier_tiers
    from ..jitcache import dyn_get

    ld = integral.levelset_domain
    o = order if ld["force_intorder"] < 0 else ld["force_intorder"]
    if integral.force_intorder >= 0:
        o = integral.force_intorder
    deform = (integral.deformation if integral.deformation is not None
              else "inherit")
    cap = getattr(integral, "_cut_cap", None) or _cut_capacity(ld["levelset"])
    tiers = two_tier_tiers(mesh, ld["levelset"], int(ld["domain_type"]), o,
                           cap, ld["quad_dir_policy"], dyn=dyn, deform=deform)

    if integral.definedonelements is not None:
        sel_arr = dyn_get(dyn, integral, "mask",
                          jnp.asarray(integral.definedonelements))
        masked = []
        for (ctx, w, mask, sids) in tiers:
            s = sel_arr if sids is None else sel_arr[sids]
            masked.append((ctx, jnp.where(s[:, None], w, 0.0),
                           mask & s[:, None], sids))
        tiers = masked
    return tiers


def _facet_patch_fids(integral: Integral, mesh):
    """Selected interior facets of a facet-patch integral (host numpy)."""
    f2e = mesh.facet2el_np
    sel = f2e[:, 1] >= 0
    if integral.definedonelements is not None:  # facet mask here
        sel = sel & integral.definedonelements
    return np.nonzero(sel)[0]


def _facet_capacity(mesh, integral):
    """Bucketed capacity for a dynamic facet selection (cf. _cut_capacity)."""
    import math

    n = len(_facet_patch_fids(integral, mesh))
    return 1 << max(6, math.ceil(math.log2(max(1, int(n * 1.3) + 16))))


def _dyn_facet_sel(integral: Integral, mesh, dyn):
    """Device-computed capacity-padded facet compaction for a dynamic facet
    selection (VERDICT r2 item 7: re-marking a moving ghost-penalty band must
    not recompile).  Returns (fids (cap,), valid (cap,), poison scalar)."""
    from ..jitcache import dyn_get

    cap = getattr(integral, "_facet_cap", None) or _facet_capacity(
        mesh, integral)
    interior = jnp.asarray(mesh.facet2el_np[:, 1] >= 0)
    m = dyn_get(dyn, integral, "fmask",
                jnp.asarray(integral.definedonelements))
    sel = interior & m
    nsel = jnp.sum(sel)
    fids = jnp.nonzero(sel, size=cap, fill_value=0)[0]
    valid = jnp.arange(cap) < nsel
    poison = jnp.where(nsel <= cap, 0.0, jnp.nan)  # overflow -> loud NaN
    return fids, valid, poison


def block_dofmap_dev(space, block_key, e1, e2):
    """Device analog of block_dofmap for dynamically-compacted facet rows."""
    blk, other = block_key
    sp = _block_space(space, blk)
    off = _block_offset(space, blk)
    eids = e2 if other else e1
    e2d = sp.el2dof_np  # host literal; gathered by traced eids
    dm = jnp.asarray(e2d)[eids]
    if isinstance(sp, VectorFESpace):
        dm = jnp.concatenate([c * sp.nscal + dm for c in range(sp.vdim)],
                             axis=1)
    return dm + off


def _facet_patch_ctx(integral: Integral, mesh, order, dyn=None, fids=None):
    """Contexts for facet-patch integrals: union of both neighbor volume rules.

    Returns (ctx_self, elem_ids_self, elem_ids_other, w_phys, mask); ctx has
    `other_ctx` attached.  The map into the neighbor element is a Newton solve
    on the DEFORMED physical coordinates (cf. MapPatchIntegrationPoint,
    symboliccutbfi.cpp:1116-1199) — identifying patch points physically is
    what keeps the penalty consistent at higher order under isoparametric
    deformation.  With time_order >= 0 the rule is tensorized with time Gauss
    points first, so a space-time deformation is applied per time point
    (cf. the space-time variant, symboliccutbfi.cpp:1256-1324).
    """
    f2e = mesh.facet2el_np
    dynamic = fids is None and integral.definedonelements is not None
    if dynamic:
        fids, fvalid, fpoison = _dyn_facet_sel(integral, mesh, dyn)
    elif fids is None:
        fids = _facet_patch_fids(integral, mesh)
    e1 = jnp.asarray(f2e[:, 0])[jnp.asarray(fids)]
    e2 = jnp.maximum(jnp.asarray(f2e[:, 1])[jnp.asarray(fids)], 0)
    from ..jitcache import dyn_get

    dyn = dyn or {}
    verts = dyn_get(dyn, mesh, "vertices", mesh.vertices)
    els = dyn_get(dyn, mesh, "elements", mesh.elements)
    deform = (integral.deformation if integral.deformation is not None
              else mesh.deformation)

    o = order if integral.force_intorder < 0 else integral.force_intorder
    rp, rw = reference_rule(mesh.et, o)
    rp = jnp.asarray(rp, dtype=config.dtype)
    rw = jnp.asarray(rw, dtype=config.dtype)
    F, nq, d = fids.shape[0], rp.shape[0], mesh.dim

    from ..mesh.mesh import map_points, det_and_inv

    coords1 = verts[els[e1]]
    coords2 = verts[els[e2]]

    # tensorize with time FIRST: the deformed patch mapping is time-dependent
    times = None
    w_time = None
    nt = 1
    base = jnp.broadcast_to(rp[None], (F, nq, d))
    if integral.time_order >= 0:
        from ..ops.gauss import gauss_legendre_01

        tg, tw = gauss_legendre_01(max(1, (integral.time_order + 2) // 2))
        tg = jnp.asarray(tg, dtype=config.dtype)
        tw = jnp.asarray(tw, dtype=config.dtype)
        nt = tg.shape[0]
        base = jnp.repeat(base, nt, axis=1)  # (F, nq*nt, d)
        times = jnp.broadcast_to(tg[None, None, :], (F, nq, nt)).reshape(F, nq * nt)
        w_time = jnp.broadcast_to(tw[None, None, :], (F, nq, nt)).reshape(F, nq * nt)

    def def_map(coords, eids, pts, with_jac=True):
        phys, J = map_points(mesh.et, coords, pts)
        if deform is not None:
            from ..fem.gridfunction import gf_ref_value_and_grad

            disp, dgrad = gf_ref_value_and_grad(deform, eids, pts, dyn=dyn,
                                                time=times)
            phys = phys + disp
            J = J + dgrad
        return phys, J

    niter = 0
    if mesh.et in ("quad", "hex"):
        niter = 4
    if deform is not None:
        niter = 8

    def other_refpts(coords_from, e_from, coords_to, e_to, pts):
        target, _ = def_map(coords_from, e_from, pts)
        # initial affine guess using the target cell's center Jacobian
        center = jnp.full((F, 1, d), 0.5 if mesh.et in ("quad", "hex") else 0.25,
                          dtype=config.dtype)
        c_phys, Jc = map_points(mesh.et, coords_to, center)
        detc, Jcinv = det_and_inv(Jc)
        xr0 = jnp.einsum("eqg,eodg->eqd", target - c_phys, Jcinv) + center
        xr = xr0
        for _ in range(niter):
            p, J = def_map(coords_to, e_to, xr)
            _, Jinv = det_and_inv(J)
            xr = xr + jnp.einsum("eqg,eqdg->eqd", target - p, Jinv)
        if niter == 0:
            return xr
        # convergence check + fallback (reference MapPatchIntegrationPoint
        # warns and falls back to a low-order rule on non-convergence,
        # symboliccutbfi.cpp:1184-1199): non-converged points revert to the
        # affine initial guess — the affine patch map is exact for straight
        # simplices, so the fallback degrades the deformation order, not
        # correctness.
        p, _ = def_map(coords_to, e_to, xr)
        err = jnp.linalg.norm(target - p, axis=-1)  # (F, Q)
        h = jnp.abs(detc[:, :1]) ** (1.0 / d)
        tol = 1e4 * jnp.finfo(xr.dtype).eps * jnp.maximum(h, 1e-30)
        conv = err <= tol
        if config.newton_debug:
            from ..utils.diagnostics import emit_nonconverged

            emit_nonconverged("facet-patch Newton map",
                              "the affine patch map",
                              jnp.sum(~conv), conv.size)
        return jnp.where(conv[..., None], xr, xr0)

    pts1_in_2 = other_refpts(coords1, e1, coords2, e2, base)
    pts2_in_1 = other_refpts(coords2, e2, coords1, e1, base)

    self_pts = jnp.concatenate([base, pts2_in_1], axis=1)  # on e1
    other_pts = jnp.concatenate([pts1_in_2, base], axis=1)  # on e2

    _, J1 = def_map(coords1, e1, base)
    _, J2 = def_map(coords2, e2, base)
    det1, _ = det_and_inv(J1)
    det2, _ = det_and_inv(J2)
    rwq = rw[None]
    if nt > 1:
        rwq = jnp.repeat(rw[None], nt, axis=1).reshape(1, nq * nt) * w_time
    w = jnp.concatenate([jnp.abs(det1) * rwq, jnp.abs(det2) * rwq], axis=1)
    if times is not None:
        times = jnp.concatenate([times, times], axis=1)

    ctx = EvalCtx(mesh, self_pts, elem_ids=e1, dyn=dyn, time=times,
                  deformation=deform)
    ctx.other_ctx = EvalCtx(mesh, other_pts, elem_ids=e2, dyn=dyn, time=times,
                            deformation=deform)
    ctx.facet_ids = jnp.asarray(fids)
    if dynamic:
        w = jnp.where(fvalid[:, None], w, 0.0) + fpoison
        ctx.dynamic_sel = (e1, e2, fvalid)
        mask = jnp.broadcast_to(fvalid[:, None], w.shape)
    else:
        mask = jnp.ones(w.shape, dtype=bool)
    return ctx, e1, e2, w, mask


def _element_boundary_ctx(integral: Integral, mesh, order, dyn=None):
    """Per-facet quadrature on every element's own boundary, single-sided
    (reference T_CalcElementMatrixEBAdd, ``xfem/symboliccutbfi.cpp:319,
    491-678``): rows are (element, local facet) pairs; trial and test factors
    both live on the row's element; the context normal is that element's
    outward facet normal.

    With a ``levelset_domain`` each facet carries a codim-1 straight-cut rule
    built from the level-set values at its corners (SEGM facets of 2D
    elements / TRIG-split facets of 3D elements), matching the live facet
    loop of the reference.  With ``time_order >= 0`` the rule is tensorized
    with time Gauss points.

    Returns (ctx, row_elem_ids, w_phys, mask).
    """
    from ..mesh.mesh import FACET_VERTS, FACET_ET, geom_shapes, geom_dshapes
    from ..ops.cuttables import REF_VERTS
    from ..jitcache import dyn_get

    dyn = dyn or {}
    d = mesh.dim
    et = mesh.et
    fet = FACET_ET[et]
    fv_loc = np.array(FACET_VERTS[et], dtype=np.int32)  # (nfel, nvf)
    nfel, nvf = fv_loc.shape
    ne = mesh.ne
    R = ne * nfel  # rows

    refv = REF_VERTS[et]
    # element-local reference coordinates of each local facet's vertices
    loc_ref = jnp.asarray(refv[fv_loc], dtype=config.dtype)  # (nfel, nvf, d)
    loc_ref = jnp.broadcast_to(loc_ref[None], (ne, nfel, nvf, d)).reshape(
        R, nvf, d
    )
    row_e = np.repeat(np.arange(ne, dtype=np.int32), nfel)
    # global facet vertex ids per row (host: static topology)
    fverts = mesh.elements_np[:, fv_loc].reshape(R, nvf)

    # facet-parametric rule: plain, or a cut rule from lset corner values;
    # time-tensorized at the PARAMETRIC level so deformed tangents are
    # computed per (point, time) pair
    rp_dyn, rw_dyn, nref_if = _facet_param_rule(
        integral, fet, d, order, fverts, dyn, R)
    rp_dyn, rw_dyn, nref_if, times = _time_tensorize_param(
        integral.time_order, rp_dyn, rw_dyn, nref_if)

    # map facet-parametric points into the element reference cell
    Nf = geom_shapes(fet, rp_dyn)  # (R, nq, nvf)
    pts = jnp.einsum("rqk,rkd->rqd", Nf, loc_ref)

    # physical facet measure and outward normal
    verts = dyn_get(dyn, mesh, "vertices", mesh.vertices)
    phys_fverts = verts[jnp.asarray(fverts)]  # (R, nvf, d)
    dNf = geom_dshapes(fet, rp_dyn)  # (R, nq, nvf, d-1)
    tang = jnp.einsum("rqks,rkd->rqsd", dNf, phys_fverts)
    deform = (integral.deformation if integral.deformation is not None
              else mesh.deformation)
    tang = _deformed_tangents(tang, deform, jnp.asarray(row_e), pts, dNf,
                              loc_ref, dyn, time=times)
    w, n = _facet_measure_normal(tang, nref_if, rw_dyn, d)
    els = dyn_get(dyn, mesh, "elements", mesh.elements)[jnp.asarray(row_e)]
    cent = jnp.mean(verts[els], axis=1)  # (R, d)
    fcm = jnp.mean(phys_fverts, axis=1)
    sign = jnp.sign(jnp.einsum("rqd,rd->rq", n, fcm - cent))
    sign = jnp.where(sign == 0, 1.0, sign)
    n = n * sign[..., None]

    ctx = EvalCtx(mesh, pts, elem_ids=jnp.asarray(row_e), normal=n, dyn=dyn,
                  time=times, deformation=deform)
    ctx.facet_ids = jnp.asarray(mesh.el2facet_np.reshape(-1))
    mask = w > 0
    if integral.definedonelements is not None:
        sel_arr = dyn_get(dyn, integral, "mask",
                          jnp.asarray(integral.definedonelements))
        sel = sel_arr[jnp.asarray(row_e)][:, None]
        mask = mask & sel
        w = jnp.where(sel, w, 0.0)
    return ctx, row_e, w, mask


def _boundary_ctx(integral: Integral, mesh, order, dyn=None):
    """Quadrature on the domain boundary ("BND elements" = boundary facets,
    cf. reference CutInformation's BND loop, ``xfem/cutinfo.cpp:54-188``, and
    SymbolicCutBFI's VOL_or_BND dispatch): one row per boundary facet, trial
    and test factors live on the (unique) adjacent volume element, the
    context normal is the outward boundary normal.

    With a ``levelset_domain`` each boundary facet carries a codim-1
    straight-cut rule from the level-set values at its corners, so NEG/POS
    parts of the outer boundary integrate exactly (linear level sets).

    ``definedonelements`` may be a mask over boundary elements (len = #bnd
    facets) or over volume elements (len = ne, applied via adjacency).

    Returns (ctx, row_elem_ids, w_phys, mask).
    """
    from ..mesh.mesh import FACET_ET, geom_shapes, geom_dshapes
    from ..jitcache import dyn_get

    dyn = dyn or {}
    d = mesh.dim
    et = mesh.et
    fet = FACET_ET[et]
    bf = mesh.boundary_facets_np  # (B,) facet ids
    B = len(bf)

    f2e = mesh.facet2el_np
    row_e = f2e[bf, 0]  # adjacent volume element per boundary facet
    fverts = mesh.facets_np[bf]  # (B, nvf) global vertex ids

    # element-local reference coordinates of the facet's vertices
    # (shared per-mesh cache; boundary facets live on side 0)
    loc_ref = jnp.asarray(_facet_locref_tables(mesh)[0][bf],
                          dtype=config.dtype)

    # facet-parametric rule: plain, or codim-1 cut rule from corner values;
    # time-tensorized at the PARAMETRIC level (space-time deformations)
    rp_dyn, rw_dyn, nref_if = _facet_param_rule(
        integral, fet, d, order, fverts, dyn, B)
    rp_dyn, rw_dyn, nref_if, times = _time_tensorize_param(
        integral.time_order, rp_dyn, rw_dyn, nref_if)

    # map facet-parametric points into the element reference cell
    Nf = geom_shapes(fet, rp_dyn)  # (B, nq, nvf)
    pts = jnp.einsum("bqk,bkd->bqd", Nf, loc_ref)

    # physical facet measure and outward normal
    verts = dyn_get(dyn, mesh, "vertices", mesh.vertices)
    phys_fverts = verts[jnp.asarray(fverts)]  # (B, nvf, d)
    dNf = geom_dshapes(fet, rp_dyn)  # (B, nq, nvf, d-1)
    tang = jnp.einsum("bqks,bkd->bqsd", dNf, phys_fverts)
    # isoparametric deformation: correct the facet tangents (and thus the
    # measure and normal below) by the displacement's tangential derivative —
    # BND-cut integrals under SetDeformation must see the deformed boundary
    # exactly where the lsetcurving shift is nonzero (interface crossing the
    # outer boundary).
    deform = (integral.deformation if integral.deformation is not None
              else mesh.deformation)
    tang = _deformed_tangents(tang, deform, jnp.asarray(row_e), pts, dNf,
                              loc_ref, dyn, time=times)
    w, n = _facet_measure_normal(tang, nref_if, rw_dyn, d)
    elarr = dyn_get(dyn, mesh, "elements", mesh.elements)[jnp.asarray(row_e)]
    cent = jnp.mean(verts[elarr], axis=1)
    fcm = jnp.mean(phys_fverts, axis=1)
    sign = jnp.sign(jnp.einsum("bqd,bd->bq", n, fcm - cent))
    sign = jnp.where(sign == 0, 1.0, sign)
    n = n * sign[..., None]

    ctx = EvalCtx(mesh, pts, elem_ids=jnp.asarray(row_e), normal=n, dyn=dyn,
                  time=times, deformation=deform)
    ctx.facet_ids = jnp.asarray(bf)
    mask = w > 0
    if integral.definedonelements is not None:
        sel_arr = dyn_get(dyn, integral, "mask",
                          jnp.asarray(_bnd_mask_np(integral, mesh)))
        sel = sel_arr[:, None]
        mask = mask & sel
        w = jnp.where(sel, w, 0.0)
    return ctx, row_e, w, mask


def _bnd_mask_np(integral: Integral, mesh):
    """Per-boundary-facet selection mask of a BND integral (host numpy);
    accepts masks over boundary facets (the canonical BND-element semantics)
    or over volume elements (adjacency)."""
    sel_np = np.asarray(integral.definedonelements)
    bf = mesh.boundary_facets_np
    if len(sel_np) == len(bf):  # boundary-element mask (preferred reading)
        if len(bf) == mesh.ne:
            import warnings

            warnings.warn(
                "BND definedonelements length matches BOTH the boundary-"
                "facet and volume-element counts; interpreting it as a "
                "boundary-element mask (pass a volume mask of a finer mesh "
                "to disambiguate)")
        return sel_np
    if len(sel_np) == mesh.ne:  # volume-element mask via adjacency
        return sel_np[mesh.facet2el_np[bf, 0]]
    raise ValueError(
        "definedonelements for a BND integral must mask boundary "
        f"elements ({len(bf)}) or volume elements ({mesh.ne})"
    )


from ..jitcache import LRUCache as _LRU
_ASM_CACHE = _LRU(maxsize=128)


def _check_proxy_spaces(form, space_u, space_v):
    """Every trial proxy in the form must come from the trial space and every
    test proxy from the test space — with a rectangular BilinearForm a proxy
    from a third space would silently scatter through the wrong dof map."""

    def root(p):
        return p.compound[0] if p.compound is not None else p.space

    def walk(cf):
        if isinstance(cf, ProxyFunction):
            want = space_v if cf.test else space_u
            if root(cf) is not want:
                kind = "test" if cf.test else "trial"
                raise ValueError(
                    f"{kind} function in the form does not belong to the "
                    f"declared {kind} space of this BilinearForm")
        if isinstance(cf, CF):
            for c in cf.children():
                walk(c)

    walk(form)


def _form_difforders(form):
    """Minimum spatial derivative order of the form's trial and test proxies
    (reference: ``SymbolicCutBFI`` reduces the cut-rule order by these on
    simplices, ``xfem/symboliccutbfi.cpp:96-107``).  Unknown/space-time ops
    count as 0 (no reduction — conservative)."""

    def dord(p):
        if p.op == "dnk":
            return int(p.op_args[0])
        if p.op in ("grad", "div") or p.op.endswith("grad"):
            return 1
        return 0

    tr = te = 99

    def walk(cf):
        nonlocal tr, te
        if isinstance(cf, ProxyFunction):
            if cf.test:
                te = min(te, dord(cf))
            else:
                tr = min(tr, dord(cf))
        if isinstance(cf, CF):
            for c in cf.children():
                walk(c)

    walk(form)
    return (0 if tr == 99 else tr), (0 if te == 99 else te)


def _bfi_intorder(integral, mesh, space_u, space_v):
    """Volume-BFI integration order: trial + test space order, reduced on
    simplex elements by the minimum derivative order of the form's trial
    and test proxies — the reference's rule (``symboliccutbfi.cpp:96-107``:
    ``intorder = trial.Order()+test.Order()``, minus the diff-orders for
    TRIG/TET).  E.g. P1 ``grad(u)*grad(v)`` has a piecewise-CONSTANT
    integrand, so the expensive cut tier only needs the order-0 (measure)
    rule.  ``force_intorder`` overrides downstream as before."""
    o = _space_order(space_u) + _space_order(space_v)
    if mesh.et in ("trig", "tet"):
        tr, te = _form_difforders(integral.form)
        o = max(0, o - tr - te)
    return o


def _assembly_signature(space, mesh, integrals, kind, space2=None):
    """Structural signature of an Assemble call + dynamic slot registry."""
    from ..jitcache import (
        DynSlots, cf_signature, mesh_signature, register_mesh_dynamics, obj_uid,
        register_space,
    )

    slots = DynSlots()
    register_mesh_dynamics(mesh, slots)
    parts = []
    for integral in integrals:
        p = []
        if integral.definedonelements is not None:
            if integral.facet_patch or integral.skeleton:
                # dynamic capacity-padded facet compaction: re-marking a
                # moving ghost-penalty band re-signatures only when the
                # selected-facet count outgrows its power-of-two bucket
                integral._facet_cap = _facet_capacity(mesh, integral)
                slots.slot(integral, "fmask",
                           lambda i=integral: jnp.asarray(i.definedonelements))
                p.append(("fmask", integral._facet_cap))
            elif integral.vb == BND:
                # BND rows are static (all boundary facets): dynamic weight
                # mask, pre-converted to per-boundary-facet form
                slots.slot(integral, "mask",
                           lambda i=integral, m=mesh:
                           jnp.asarray(_bnd_mask_np(i, m)))
                p.append(("mask",))
            else:
                slots.slot(integral, "mask",
                           lambda i=integral: jnp.asarray(i.definedonelements))
                p.append(("mask",))
        if integral.levelset_domain is not None:
            if integral.levelset_domain["subdivlvl"] > 0:
                # CF level set under the subdivision path: key by the CF's
                # structural signature (GF dofs / Parameters become dynamic
                # slots, so a moving interface never recompiles)
                from ..cf.coefficient import wrap as _wrap

                p.append(
                    (
                        "subdiv",
                        int(integral.levelset_domain["domain_type"]),
                        integral.levelset_domain["subdivlvl"],
                        cf_signature(
                            _wrap(integral.levelset_domain["levelset"]),
                            slots),
                        integral.levelset_domain["force_intorder"],
                    )
                )
            else:
                lgf = integral.levelset_domain["levelset"]
                slots.slot(lgf, "vec", lambda g=lgf: g._arr)
                register_space(lgf.space, slots)
                p.append(
                    (
                        "cut",
                        int(integral.levelset_domain["domain_type"]),
                        obj_uid(lgf.space),
                        integral.levelset_domain["force_intorder"],
                        # the QUAD/HEX axis policy changes the compiled cut
                        # rule — omitting it collided FIRST/FALLBACK
                        # assemblies onto whichever compiled first
                        integral.levelset_domain["quad_dir_policy"],
                    )
                )
            if (_two_tier_applicable(integral, mesh)
                    and not (integral.facet_patch or integral.skeleton
                             or integral.element_boundary
                             or integral.vb == BND)):
                # two-tier cut compaction capacity: re-derived every Assemble
                # (host count, power-of-two bucket) and part of the signature,
                # so a moving level set re-signatures instead of overflowing
                integral._cut_cap = _cut_capacity(lgf)
                p.append(("cap", integral._cut_cap))
        if integral.deformation is not None:
            dg = integral.deformation
            slots.slot(dg, "vec", lambda g=dg: g._arr)
            register_space(dg.space, slots)
            p.append(("deform", obj_uid(dg.space)))
        p.append(("fp", integral.facet_patch, integral.skeleton,
                  integral.element_boundary, integral.vb,
                  integral.force_intorder, integral.time_order))
        p.append(cf_signature(integral.form, slots))
        parts.append(tuple(p))
    sig = (kind, obj_uid(space),
           obj_uid(space2) if space2 is not None else None,
           mesh_signature(mesh), tuple(parts))
    return sig, slots


def _msk(arr, mask):
    """Zero a factor array at padded quadrature points (NaN-safe: singular
    coefficients absorbed into factors must not poison 0-weight points)."""
    m = mask.reshape(mask.shape + (1,) * (arr.ndim - 2))
    return jnp.where(m, arr, 0.0)


def _facet_param_rule(integral, fet, d, order, fverts, dyn, R):
    """Facet-parametric quadrature shared by the BND / element-boundary /
    skeleton context builders: the plain reference rule, or — with a
    ``levelset_domain`` — a codim-1 straight-cut rule from the level-set
    values at the facet corners (codim-2 IF branch returns its reference
    zero-set normals).  Returns (rp_dyn (R,nq,d-1), rw_dyn (R,nq),
    nref_if or None)."""
    from ..ops.cuttables import REF_VERTS

    o = order if integral.force_intorder < 0 else integral.force_intorder
    if integral.levelset_domain is not None:
        from ..ops.straightcut import cut_rule_simplices, eps_guard
        from ..ops.cuttables import ET_SPLIT
        from ..integrate import _p1_vertex_dofs
        from ..jitcache import dyn_get

        ld = integral.levelset_domain
        if integral.force_intorder < 0 and ld.get("force_intorder", -1) >= 0:
            o = int(ld["force_intorder"])  # dict option, like the volume path
        dtq = int(ld["domain_type"])
        if dtq not in (int(NEG), int(POS), int(IF)):
            # combined types (HASNEG, ...) would silently zero every weight
            raise ValueError(
                f"facet cut integrals support NEG/POS/IF domain types, got "
                f"{ld['domain_type']!r}")
        lgf = ld["levelset"]
        vdofs = _p1_vertex_dofs(lgf.space)
        vec = dyn_get(dyn or {}, lgf, "vec", lgf._arr)
        fvals = vec[jnp.asarray(vdofs)[jnp.asarray(fverts)]]  # (R, nvf)
        split = ET_SPLIT[fet]
        nsplit = split.shape[0]
        refvf = jnp.asarray(REF_VERTS[fet], dtype=config.dtype)
        fc = jnp.broadcast_to(
            refvf[jnp.asarray(split)][None],
            (R, nsplit, split.shape[1], d - 1)
        ).reshape(R * nsplit, split.shape[1], d - 1)
        fvv = eps_guard(fvals[:, jnp.asarray(split)].reshape(R * nsplit, -1))
        r = cut_rule_simplices(fc, fvv, d - 1, o)
        if dtq == int(IF):
            # codim-2: the zero set WITHIN the facet (points on 2D element
            # boundaries, segments on 3D faces) — the reference's
            # experimental unfitted codim-2 branch
            # (xfem/symboliccutbfi.cpp:732, 898-946)
            qi = r.pts_if.shape[1]
            return (r.pts_if.reshape(R, nsplit * qi, d - 1),
                    r.w_if.reshape(R, nsplit * qi),
                    r.nref.reshape(R, nsplit * qi, d - 1))
        qn = r.pts.shape[1]
        return (r.pts.reshape(R, nsplit * qn, d - 1),
                (r.w * (r.side == dtq)).reshape(R, nsplit * qn), None)
    rp_s, rw_s = reference_rule(fet, o)
    nqf = rw_s.shape[0]
    rp_dyn = jnp.broadcast_to(
        jnp.asarray(rp_s, dtype=config.dtype)[None], (R, nqf, d - 1))
    rw_dyn = jnp.broadcast_to(
        jnp.asarray(rw_s, dtype=config.dtype)[None], (R, nqf))
    return rp_dyn, rw_dyn, None


def _time_tensorize_param(time_order, rp, rw, nref=None):
    """Tensorize a facet-PARAMETRIC rule with time Gauss points, BEFORE any
    geometry is derived from it — so tangents/measures/normals (and their
    isoparametric deformation corrections) are computed per (point, time)
    pair, which a space-time deformation requires.  One implementation for
    the BND / element-boundary / skeleton builders.

    Returns (rp, rw, nref, times); times is None when time_order < 0."""
    if time_order < 0:
        return rp, rw, nref, None
    from ..ops.gauss import gauss_legendre_01

    tg, tw = gauss_legendre_01(max(1, (time_order + 2) // 2))
    tg = jnp.asarray(tg, dtype=config.dtype)
    tw = jnp.asarray(tw, dtype=config.dtype)
    nt = tg.shape[0]
    R, Q = rw.shape
    rp = jnp.repeat(rp, nt, axis=1)
    rw = (rw[:, :, None] * tw[None, None, :]).reshape(R, Q * nt)
    if nref is not None:
        nref = jnp.repeat(nref, nt, axis=1)
    times = jnp.broadcast_to(tg[None, None, :], (R, Q, nt)).reshape(R, Q * nt)
    return rp, rw, nref, times


def _facet_measure_normal(tang, nref_if, rw_dyn, d):
    """Physical facet weights and (unoriented) unit normal from the facet
    tangents; codim-2 IF rules use the zero-set tangent length (3D) or the
    counting measure (2D).  Shared by the three facet context builders."""
    from ..ops.straightcut import _gram_measure

    if nref_if is not None:
        if d == 2:
            scale = jnp.ones_like(rw_dyn)
        else:
            that = jnp.stack([nref_if[..., 1], -nref_if[..., 0]], axis=-1)
            tvec = jnp.einsum("rqs,rqsd->rqd", that, tang)
            scale = jnp.linalg.norm(tvec, axis=-1)
    else:
        scale = _gram_measure(tang)
    w = scale * rw_dyn
    if d == 2:
        t = tang[:, :, 0, :]
        n = jnp.stack([t[..., 1], -t[..., 0]], axis=-1)
    else:
        n = jnp.cross(tang[:, :, 0, :], tang[:, :, 1, :])
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    return w, n / jnp.where(nn < 1e-30, 1.0, nn)


def _deformed_tangents(tang, deform, row_e, pts, dNf, loc_ref, dyn,
                       time=None):
    """Correct physical facet tangents for an isoparametric deformation.

    The facet measure and normal are computed from the tangents of the
    facet-parametric geometry map; under ``SetDeformation`` (or a
    per-integral ``deformation=`` override) the PHYSICAL map is
    ``x + D(x)``, so the tangents gain the displacement's tangential
    derivative ``dD/dref * dref/ds``.  Shared by the BND, element-boundary
    and skeleton context builders (one fix, three call sites)."""
    if deform is None:
        return tang
    from ..fem.gridfunction import gf_ref_value_and_grad

    _, dgrad = gf_ref_value_and_grad(deform, row_e, pts, dyn=dyn,
                                     time=time)  # (R,nq,d,d_ref)
    dref_ds = jnp.einsum("rqks,rkd->rqsd", dNf, loc_ref)
    return tang + jnp.einsum("rqgd,rqsd->rqsg", dgrad, dref_ds)


def _facet_locref_tables(mesh):
    """(2, nfacets, nvf, d) element-local reference coordinates of every
    facet's vertices, per side (boundary facets duplicate side 0).  Host
    numpy, cached per mesh topology — levelset-independent, so dynamic facet
    selections gather from it on device."""
    from ..ops.cuttables import REF_VERTS

    cached = getattr(mesh, "_facet_locref_cache", None)
    if cached is not None and cached[0] == (mesh.ne, mesh.nfacets):
        return cached[1]
    refv = REF_VERTS[mesh.et]
    f2e = mesh.facet2el_np
    fverts = mesh.facets_np  # (nf, nvf)
    nvf = fverts.shape[1]
    d = mesh.dim
    loc_ref = np.zeros((2, mesh.nfacets, nvf, d))
    for s in range(2):
        eids = np.where(f2e[:, s] >= 0, f2e[:, s], f2e[:, 0])
        els = mesh.elements_np[eids]  # (nf, nvel)
        for k in range(nvf):
            idx = np.argmax(els == fverts[:, k][:, None], axis=1)
            loc_ref[s, :, k, :] = refv[idx]
    mesh._facet_locref_cache = ((mesh.ne, mesh.nfacets), loc_ref)
    return loc_ref


def _skeleton_ctx(integral: Integral, mesh, order, dyn=None):
    """Facet (skeleton) quadrature mapped into both neighbor elements.

    The non-cut part of the reference's facet machinery
    (SymbolicFacetBilinearFormIntegrator2, xfem/symboliccutbfi.cpp:948-1102):
    a rule on the facet itself, consistent physical points on both sides,
    facet normal provided for dn()-jump ghost penalties.

    A ``definedonelements`` facet selection is DYNAMIC: the compaction is
    capacity-padded and computed on device (_dyn_facet_sel), so re-marking
    facets (moving ghost-penalty bands) re-uses the compiled program.
    Returns (ctx, e1, e2, w, mask); ctx.dynamic_sel is set when dynamic.
    """
    from ..mesh.mesh import (
        FACET_VERTS, FACET_ET, map_points, det_and_inv, geom_shapes, geom_dshapes,
    )
    from ..jitcache import dyn_get

    f2e = mesh.facet2el_np
    d = mesh.dim
    fet = FACET_ET[mesh.et]

    dynamic = integral.definedonelements is not None
    loc_all = _facet_locref_tables(mesh)  # (2, nf, nvf, d) host
    if dynamic:
        fids, fvalid, fpoison = _dyn_facet_sel(integral, mesh, dyn)
        F = fids.shape[0]
        fverts = jnp.asarray(mesh.facets_np)[fids]  # (F, nvf)
        loc_ref = jnp.asarray(loc_all, dtype=config.dtype)[:, fids]
    else:
        fids = np.nonzero(f2e[:, 1] >= 0)[0]
        F = len(fids)
        fverts = mesh.facets_np[fids]  # (F, nvf) global vertex ids
        loc_ref = jnp.asarray(loc_all[:, fids], dtype=config.dtype)
    nvf = mesh.facets_np.shape[1]

    # facet-parametric quadrature: plain rule, or a cut rule on the facet
    # itself for SymbolicCutFacetBFI (xfem/symboliccutbfi.cpp:682-946);
    # time-tensorized at the PARAMETRIC level (reference space-time skeleton
    # rule, SymbolicFacetBilinearFormIntegrator2,
    # xfem/symboliccutbfi.cpp:948-1102) so deformed tangents see the time
    rp_dyn, rw_dyn, nref_if = _facet_param_rule(
        integral, fet, d, order, fverts, dyn, F)
    rp_dyn, rw_dyn, nref_if, times = _time_tensorize_param(
        integral.time_order, rp_dyn, rw_dyn, nref_if)

    # facet geometry map (multilinear in the facet ref coords)
    Nf = geom_shapes(fet, rp_dyn)  # (F, nqf, nvf)
    pts1 = jnp.einsum("fqk,fkd->fqd", Nf, loc_ref[0])  # (F,nqf,d) in e1 ref
    pts2 = jnp.einsum("fqk,fkd->fqd", Nf, loc_ref[1])

    dyn = dyn or {}
    verts = dyn_get(dyn, mesh, "vertices", mesh.vertices)
    e1 = jnp.asarray(f2e[:, 0])[jnp.asarray(fids)]
    e2 = jnp.maximum(jnp.asarray(f2e[:, 1])[jnp.asarray(fids)], 0)

    deform = (integral.deformation if integral.deformation is not None
              else mesh.deformation)
    ctx = EvalCtx(mesh, pts1, elem_ids=e1, dyn=dyn, deformation=deform,
                  time=times)
    ctx.other_ctx = EvalCtx(mesh, pts2, elem_ids=e2, dyn=dyn,
                            deformation=deform, time=times)
    ctx.facet_ids = jnp.asarray(fids)

    # physical facet measure + normal (from the e1 side geometry)
    phys_fverts = verts[jnp.asarray(fverts)]  # (F, nvf, d)
    dNf = geom_dshapes(fet, rp_dyn)  # (F, nqf, nvf, d-1)
    tang = jnp.einsum("fqks,fkd->fqsd", dNf, phys_fverts)  # (F,nqf,d-1,d)
    tang = _deformed_tangents(tang, deform, e1, pts1, dNf, loc_ref[0], dyn,
                              time=times)
    w, n = _facet_measure_normal(tang, nref_if, rw_dyn, d)
    # orient the normal from e1 to e2: away from the e1 centroid
    els1 = dyn_get(dyn, mesh, "elements", mesh.elements)[e1]
    cent1 = jnp.mean(verts[els1], axis=1)  # (F, d)
    fcm = jnp.mean(phys_fverts, axis=1)
    sign = jnp.sign(jnp.einsum("fqd,fd->fq", n, fcm - cent1))
    sign = jnp.where(sign == 0, 1.0, sign)
    n = n * sign[..., None]

    ctx._normal = n
    # each side sees its own outward normal (reference dn convention, so
    # dnjump(u,k) = dn(u,k) -/+ dn(u.Other(),k) ports verbatim)
    ctx.other_ctx._normal = -n
    if dynamic:
        w = jnp.where(fvalid[:, None], w, 0.0)
        # mask from the FINITE weights; the overflow poison is added after
        # so it propagates as NaN through the weight product (loud) instead
        # of mask=False zeroing everything (silent)
        mask = (w > 0) & fvalid[:, None]
        w = w + fpoison
        ctx.dynamic_sel = (e1, e2, fvalid)
    else:
        mask = w > 0
    return ctx, e1, e2, w, mask


def _term_cfree_scalar(term, W):
    """Fold a FREE coefficient factor into the scalar weight; a free factor
    with vector/matrix components left over means the integrand is not
    scalar — raise instead of silently dropping it."""
    if term.cfree is None:
        return jnp.broadcast_to(term.scalar, W.shape)
    if term.cfree.shape[2:] != ():
        raise TypeError(
            "non-scalar integrand: a coefficient factor with free components "
            f"{term.cfree.shape[2:]} is not contracted with the trial/test "
            "functions")
    return jnp.broadcast_to(term.scalar, W.shape) * term.cfree


def _term_elmat(term, W, mask):
    """Element matrices (E, ndv, ndu) of one u&v term; W = (E,Q) weights."""
    s = _term_cfree_scalar(term, W)
    Wts = W * jnp.where(mask, s, 0.0)  # NaN-safe on padded points
    u, v = _msk(term.ufac.arr, mask), _msk(term.vfac.arr, mask)
    if term.contracted:
        return jnp.einsum("eq,eqjk,eqik->eji", Wts, v, u)
    if u.ndim != 3 or v.ndim != 3:
        raise TypeError("non-scalar integrand in bilinear form")
    return jnp.einsum("eq,eqj,eqi->eji", Wts, v, u)


def _term_elvec(term, W, mask):
    s = _term_cfree_scalar(term, W)
    Wts = W * jnp.where(mask, s, 0.0)
    v = _msk(term.vfac.arr, mask)
    if v.ndim != 3:
        raise TypeError("non-scalar integrand in linear form")
    return jnp.einsum("eq,eqj->ej", Wts, v)


def _safe_weights(w_phys, mask):
    """zero weights exactly where masked (NaN-safe: scalars are multiplied
    after masking)."""
    return jnp.where(mask, w_phys, 0.0)


class BilinearForm:
    """Square (one ``space``) or rectangular Petrov-Galerkin
    (``trialspace=``/``testspace=``, NGSolve's mixed-form constructor used by
    the reference CG-in-time demo, spacetime/py_demos/spaceP1_timeCGP1.py)
    bilinear form.  Rectangular: rows are test-space dofs, columns
    trial-space dofs; ``mat.shape = (testspace.ndof, trialspace.ndof)``."""

    def __init__(self, space=None, symmetric=False, check_unused=True,
                 element_restriction=None, facet_restriction=None, flags=None,
                 name="a", trialspace=None, testspace=None, **kw):
        if (trialspace is None) != (testspace is None):
            raise ValueError(
                "give both trialspace and testspace (or a single space)")
        if trialspace is not None:
            if space is not None:
                raise ValueError(
                    "either space or trialspace/testspace, not both")
            if trialspace.mesh is not testspace.mesh:
                raise ValueError(
                    "trial and test space must live on the same mesh")
            self.space_u, self.space_v = trialspace, testspace
            space = trialspace
        else:
            if space is None:
                raise ValueError("BilinearForm needs a space")
            self.space_u = self.space_v = space
        self.space = space
        self.symmetric = symmetric
        self.integrals = []
        self.element_restriction = element_restriction
        self.facet_restriction = facet_restriction
        self.mat = None

    def __iadd__(self, integral: Integral):
        if not isinstance(integral, Integral):
            raise TypeError("add SymbolicBFI(...) objects")
        self.integrals.append(integral)
        return self

    def Assemble(self, reallocate=False, heapsize=None):
        from ..utils.timing import Timer

        _t = Timer("BilinearForm::Assemble").Start()
        elmats, static_rc, rc_cat = self._elmat_batches()

        if rc_cat is not None:  # fast all-static path
            vals = jnp.concatenate([m.reshape(-1) for m in elmats])
            rows_cat, cols_cat = rc_cat
        else:
            vparts, rparts, cparts = [], [], []
            for out_i, rc in zip(elmats, static_rc):
                if rc is None:
                    m, r, c = out_i
                    vparts.append(m.reshape(-1))
                    rparts.append(r.reshape(-1))
                    cparts.append(c.reshape(-1))
                else:
                    vparts.append(out_i.reshape(-1))
                    rparts.append(jnp.asarray(rc[0]))
                    cparts.append(jnp.asarray(rc[1]))
            vals = jnp.concatenate(vparts)
            rows_cat = jnp.concatenate(rparts)
            cols_cat = jnp.concatenate(cparts)
        self.mat = SparseMatrix(
            rows_cat, cols_cat, vals,
            (self.space_v.ndof, self.space_u.ndof),
        )
        _t.Stop(vals)
        return self

    def AssembleOperator(self, lattice="auto"):
        """Matrix-free (partial-assembly) alternative to :meth:`Assemble`:
        runs the SAME compiled element-matrix program but returns a
        :class:`~ngsxfem_tpu.solvers.operator.PartialAssemblyOperator`
        applying ``y = A @ x`` directly from the per-element matrix batches
        (gather -> batched MXU einsum -> scatter-add) without ever
        materializing the global sparse matrix.

        No reference counterpart (the reference always assembles through
        NGSolve's sparse matrix); this is the TPU-native 'partial assembly'
        operator path for high-order unfitted systems, where the batched
        ``(E, nd, nd) x (E, nd)`` contraction maps onto the MXU and the
        element batch is the only storage.

        ``lattice``: ``"auto"`` (default) upgrades to the zero-gather
        :class:`~ngsxfem_tpu.solvers.stencilop.LatticeStencilOperator`
        when the space's dofs form a uniform channel lattice (structured
        simplex mesh, any order); ``False`` forces the generic
        partial-assembly apply; ``True`` raises if the lattice map does
        not exist."""
        from ..solvers.operator import PartialAssemblyOperator
        from ..solvers.stencilop import (LatticeStencilOperator,
                                         lattice_dof_map)

        elmats, static_rc, _ = self._elmat_batches()
        parts = []
        for out_i, rc in zip(elmats, static_rc):
            if rc is None:  # dynamic facet entry: device (m, rows, cols)
                m, r, c = out_i
                E_, ndv, ndu = m.shape
                parts.append((m, r[:, :, 0], c[:, 0, :]))
            else:
                E_, ndv, ndu = out_i.shape
                dm_v = np.asarray(rc[0]).reshape(E_, ndv, ndu)[:, :, 0]
                dm_u = np.asarray(rc[1]).reshape(E_, ndv, ndu)[:, 0, :]
                parts.append((out_i, jnp.asarray(dm_v), jnp.asarray(dm_u)))
        if lattice and self.space_v is self.space_u:
            dofmap = lattice_dof_map(self.space_v)
            if dofmap is not None:
                return LatticeStencilOperator(
                    parts, dofmap, self.space_v.ndof,
                    parts[0][0].dtype if parts else config.dtype)
            if lattice is True:
                raise ValueError(
                    "lattice=True but the space's dofs do not form a "
                    "uniform channel lattice (unstructured mesh, curved "
                    "map, or non-Lagrange space)")
        return PartialAssemblyOperator(
            parts, (self.space_v.ndof, self.space_u.ndof))

    def _elmat_batches(self):
        """Run (or replay) the compiled assembly program: the list of
        per-integral element-matrix batches plus their static scatter
        structure — shared by :meth:`Assemble` (sparse-matrix scatter) and
        :meth:`AssembleOperator` (matrix-free application)."""
        space = self.space
        space_u, space_v = self.space_u, self.space_v
        mesh = space.mesh
        order = max(_space_order(space_u), _space_order(space_v))
        for i in self.integrals:
            _ensure_p1_ld(i, mesh)
            _check_proxy_spaces(i.form, space_u, space_v)
        integrals = [self._with_restriction(i) for i in self.integrals]
        sig, slots = _assembly_signature(space, mesh, integrals, "bfi",
                                         space2=space_v)
        cached = _ASM_CACHE.get(sig)
        if cached is None:
            meta = []

            def _impl(*arrays):
                dyn = slots.env(arrays)
                meta[:] = []
                out = []
                for k, integral in enumerate(integrals):
                    if integral.facet_patch:
                        ctx, e1, e2, w_phys, mask = _facet_patch_ctx(
                            integral, mesh, 2 * order, dyn=dyn
                        )
                        tiers = [(ctx, w_phys, mask, None)]
                    elif integral.skeleton:
                        ctx, e1, e2, w_phys, mask = _skeleton_ctx(
                            integral, mesh, 2 * order, dyn=dyn
                        )
                        tiers = [(ctx, w_phys, mask, None)]
                    elif integral.element_boundary:
                        ctx, row_e, w_phys, mask = _element_boundary_ctx(
                            integral, mesh, 2 * order, dyn=dyn
                        )
                        tiers = [(ctx, w_phys, mask, None)]
                    elif integral.vb == BND:
                        ctx, row_e, w_phys, mask = _boundary_ctx(
                            integral, mesh, 2 * order, dyn=dyn
                        )
                        tiers = [(ctx, w_phys, mask, None)]
                    else:
                        tiers = _volume_tiers(
                            integral, mesh,
                            _bfi_intorder(integral, mesh, space_u, space_v),
                            dyn=dyn,
                        )
                    # terms accumulate per (trial, test) block pair; the
                    # compacted cut tier scatters into the all-elements rows
                    # so the host-side scatter structure stays static, while
                    # DYNAMIC facet selections emit their (rows, cols) from
                    # the device-computed compaction
                    acc = {}
                    dsel = None
                    for (tctx, w_phys, mask, sids) in tiers:
                        if getattr(tctx, "dynamic_sel", None) is not None:
                            dsel = tctx.dynamic_sel
                        W = _safe_weights(w_phys, mask)
                        for t in eval_form(integral.form, tctx):
                            if t.ufac is None and t.vfac is None:
                                raise TypeError(
                                    "bilinear form has a term with neither "
                                    "trial nor test function (a constant "
                                    "added to the integrand?)")
                            if t.ufac is None or t.vfac is None:
                                raise TypeError(
                                    "bilinear form term missing trial or "
                                    "test factor"
                                )
                            m = _term_elmat(t, W, mask)
                            if sids is not None:
                                m = jnp.zeros(
                                    (mesh.ne,) + m.shape[1:], m.dtype
                                ).at[sids].add(m)
                            key = (t.ufac.block, t.vfac.block)
                            acc[key] = m if key not in acc else acc[key] + m
                    for (bu, bv), m in acc.items():
                        if dsel is not None:
                            de1, de2, _dv = dsel
                            dm_u = block_dofmap_dev(space_u, bu, de1, de2)
                            dm_v = block_dofmap_dev(space_v, bv, de1, de2)
                            E_, ndv, ndu = m.shape
                            rws = jnp.broadcast_to(
                                dm_v[:, :, None], (E_, ndv, ndu))
                            cls = jnp.broadcast_to(
                                dm_u[:, None, :], (E_, ndv, ndu))
                            out.append((m, rws, cls))
                        else:
                            out.append(m)
                        meta.append((k, bu, bv))
                return out

            jfn = jax.jit(_impl)
            arrays = slots.arrays()
            elmats = jfn(*arrays)  # traces now; meta populated
            # host-side scatter structure is static per signature for static
            # entries (built ONCE and cached); dynamic facet entries carry
            # their device-computed (rows, cols) in the jit output
            static_rc = []
            fp_elems = {}
            for k, integral in enumerate(integrals):
                if integral.facet_patch or integral.skeleton:
                    if integral.definedonelements is None:
                        f2e = mesh.facet2el_np
                        fids = np.nonzero(f2e[:, 1] >= 0)[0]
                        fp_elems[k] = (f2e[fids, 0], f2e[fids, 1])
                elif integral.element_boundary:
                    nfel = len(mesh.el2facet_np[0])
                    row_e = np.repeat(np.arange(mesh.ne, dtype=np.int32), nfel)
                    fp_elems[k] = (row_e, row_e)
                elif integral.vb == BND:
                    row_e = mesh.facet2el_np[mesh.boundary_facets_np, 0]
                    fp_elems[k] = (row_e, row_e)
            for out_i, (k, bu, bv) in zip(elmats, meta):
                if isinstance(out_i, tuple):  # dynamic facet entry
                    static_rc.append(None)
                    continue
                e1, e2 = fp_elems.get(k, (None, None))
                dm_u = block_dofmap(self.space_u, bu, e1, e2)
                dm_v = block_dofmap(self.space_v, bv, e1, e2)
                E, ndv, ndu = out_i.shape
                static_rc.append((
                    np.broadcast_to(
                        dm_v[:, :, None], (E, ndv, ndu)).reshape(-1),
                    np.broadcast_to(
                        dm_u[:, None, :], (E, ndv, ndu)).reshape(-1),
                ))
            if not static_rc:
                raise ValueError("no integrals to assemble")
            if all(rc is not None for rc in static_rc):
                rc_cat = (np.concatenate([rc[0] for rc in static_rc]),
                          np.concatenate([rc[1] for rc in static_rc]))
            else:
                rc_cat = None
            cached = (jfn, list(meta), static_rc, rc_cat)
            _ASM_CACHE[sig] = cached
        else:
            jfn, meta, static_rc, rc_cat = cached
            elmats = jfn(*slots.arrays())
        return elmats, static_rc, rc_cat

    def _with_restriction(self, integral: Integral):
        """Apply the form-level restrictions (RestrictedBilinearForm,
        utils/restrictedblf.hpp:7-30): element_restriction to element-row
        integrals, facet_restriction to facet-row (skeleton / facet-patch)
        integrals.  An integral's own definedonelements wins."""
        facet_rows = integral.facet_patch or integral.skeleton
        restriction = (self.facet_restriction if facet_rows
                       else self.element_restriction)
        if restriction is None or integral.definedonelements is not None:
            return integral
        import copy

        ii = copy.copy(integral)
        ii.definedonelements = _arr(restriction).copy()
        return ii

    def Apply(self, x):
        return self.mat * x


class LinearForm:
    def __init__(self, space, name="f", **kw):
        self.space = space
        self.integrals = []
        self._vec = None

    def __iadd__(self, integral: Integral):
        self.integrals.append(integral)
        return self

    @property
    def vec(self):
        from ..fem.gridfunction import StandaloneVec

        return StandaloneVec(self._vec)

    def Assemble(self, heapsize=None):
        from ..utils.timing import Timer

        _t = Timer("LinearForm::Assemble").Start()
        space = self.space
        mesh = space.mesh
        order = _space_order(space)
        for i in self.integrals:
            _ensure_p1_ld(i, mesh)
        sig, slots = _assembly_signature(space, mesh, self.integrals, "lfi")
        cached = _ASM_CACHE.get(sig)
        if cached is None:
            meta = []
            integrals = self.integrals

            def _impl(*arrays):
                dyn = slots.env(arrays)
                meta[:] = []
                out = []
                for k, integral in enumerate(integrals):
                    if (integral.element_boundary or integral.skeleton
                            or integral.facet_patch):
                        # the reference SymbolicCutLFI also throws for these
                        # (xfem/symboliccutlfi.cpp:51-160)
                        raise NotImplementedError(
                            "LinearForm supports volume and BND integrals only")
                    if integral.vb == BND:
                        ctx, _, w_phys, mask = _boundary_ctx(
                            integral, mesh, 2 * order + mesh.dim, dyn=dyn
                        )
                        tiers = [(ctx, w_phys, mask, None)]
                    else:
                        tiers = _volume_tiers(
                            integral, mesh, 2 * order + mesh.dim, dyn=dyn
                        )
                    acc = {}
                    for (tctx, w_phys, mask, sids) in tiers:
                        W = _safe_weights(w_phys, mask)
                        for t in eval_form(integral.form, tctx):
                            if t.ufac is None and t.vfac is None:
                                raise TypeError(
                                    "linear form has a term with no test "
                                    "function (a constant added to the "
                                    "integrand?)")
                            if t.vfac is None or t.ufac is not None:
                                raise TypeError(
                                    "linear form must be linear in the test "
                                    "function"
                                )
                            ve = _term_elvec(t, W, mask)
                            if sids is not None:
                                ve = jnp.zeros(
                                    (mesh.ne,) + ve.shape[1:], ve.dtype
                                ).at[sids].add(ve)
                            bv = t.vfac.block
                            acc[bv] = ve if bv not in acc else acc[bv] + ve
                    for bv, ve in acc.items():
                        out.append(ve)
                        meta.append((k, bv))
                return out

            jfn = jax.jit(_impl)
            elvecs = jfn(*slots.arrays())
            cached = (jfn, list(meta))
            _ASM_CACHE[sig] = cached
        else:
            jfn, meta = cached
            elvecs = jfn(*slots.arrays())
        out = jnp.zeros((space.ndof,), dtype=config.dtype)
        for elvec, (k, bv) in zip(elvecs, meta):
            eids = None
            if self.integrals[k].vb == BND:
                eids = mesh.facet2el_np[mesh.boundary_facets_np, 0]
            dm_v = block_dofmap(space, bv, eids)
            out = out.at[dm_v.reshape(-1)].add(elvec.reshape(-1))
        self._vec = out
        _t.Stop(out)
        return self


def RestrictedBilinearForm(space, name="a", element_restriction=None,
                           facet_restriction=None, check_unused=False, flags=None,
                           **kw):
    """BilinearForm whose sparsity is restricted to marked elements/facets
    (utils/restrictedblf.hpp:7-30) — with COO assembly the restriction is the
    assembly mask itself."""
    return BilinearForm(space, element_restriction=element_restriction,
                        facet_restriction=facet_restriction,
                        check_unused=check_unused, flags=flags, name=name)
