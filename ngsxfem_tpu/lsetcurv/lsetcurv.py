"""Isoparametric level-set mesh deformation ("lsetcurving").

TPU-native re-design of the reference's geometry high-order layer
(``lsetcurving/``: ProjectShift ``projshift.cpp:8-173``, point search
``calcpointshift.hpp:48-57``, driver class ``lsetcurv.py:9-203``): the mesh
deformation psi maps the piecewise-linear level-set zero set onto the
high-order one.  Because our FE spaces are nodal, the shift is computed
*directly at the Lagrange nodes* by a batched Newton search along
qn = grad(lset_ho) with polynomial extension of the element basis — no
per-element mass projection / dof averaging passes are needed (they are the
reference's workaround for quadrature-point-based shifts).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..config import config
from ..fem.space import H1, VectorH1
from ..fem.gridfunction import GridFunction, InterpolateToP1
from ..fem.basis import shapes, dshapes
from ..mesh.mesh import map_points, det_and_inv
from ..integrate import vertex_local_ids, Integrate, lset_vertex_values
from ..ops.straightcut import cut_rule_element, eps_guard

from ..jitcache import LRUCache

_PS_CACHE = LRUCache(maxsize=32)


def _project_shift_kernel(mesh, order, threshold, niter=8):
    """Build the jitted shift kernel for (mesh, deform-space) once.

    All index tables are jit arguments (constant embedding is pathologically
    slow to lower, see jitcache.py).  `alpha` is the pointwise blending
    value at each dof node (reference blending CF, lsetcurv.py:118-152).
    Returns (deformation dof vector, per-node |phi - goal| Newton residual
    restricted to the active band) — the residual drives the
    non-convergence warning (reference SearchCorrespondingPoint warns,
    symboliccutbfi.cpp:1184-1192).
    """
    et = mesh.et
    d = mesh.dim
    vperm = jnp.asarray(vertex_local_ids(et, 1))

    def kernel(vertices, ho_vec, p1space_el2dof, p1_vec, rep_e, rep_p,
               el2dof, d_el2dof, elements, cutel, alpha):
        # el2dof: the ho space's map (lset gather); d_el2dof: the DEFORM
        # scalar space's map (active-band scatter) — they differ when the
        # deformation space is periodic
        nd = rep_e.shape[0]
        coords = vertices[elements[rep_e]]  # (nd, nv, d)
        pts = rep_p[:, None, :]  # (nd,1,d)
        _, J = map_points(et, coords, pts)
        detJ, Jinv = det_and_inv(J)
        h = jnp.abs(detJ[:, 0]) ** (1.0 / d)

        ho_dofs = ho_vec[el2dof[rep_e]]  # (nd, ndl)

        def phi_and_grad(ref):
            B = shapes(et, order, ref)  # (nd,1,ndl)
            G = dshapes(et, order, ref)  # (nd,1,ndl,d)
            val = jnp.einsum("nqi,ni->nq", B, ho_dofs)[:, 0]
            gref = jnp.einsum("nqid,ni->nqd", G, ho_dofs)[:, 0]
            return val, gref

        # search direction: physical gradient at the node
        phi0, gref0 = phi_and_grad(pts)
        q_phys = jnp.einsum("nd,ndg->ng", gref0, Jinv[:, 0])  # (nd, d)
        q_ref = jnp.einsum("ndg,ng->nd", Jinv[:, 0], q_phys)

        # goal value: (1-alpha)*phi_p1 + alpha*phi_ho at the node
        p1_dofs = p1_vec[p1space_el2dof[rep_e][:, vperm]]  # (nd, nvel)
        from ..mesh.mesh import geom_shapes

        Np1 = geom_shapes(et, rep_p)  # (nd, nvel)
        phi_p1 = jnp.einsum("nv,nv->n", Np1, p1_dofs)
        goal = (1.0 - alpha) * phi_p1 + alpha * phi0

        qq = jnp.einsum("ng,ng->n", q_phys, q_phys)
        qq = jnp.where(qq < 1e-30, 1.0, qq)

        def newton(t, _):
            ref = pts + (t[:, None] * q_ref)[:, None, :]
            val, gref = phi_and_grad(ref)
            dphi = jnp.einsum("nd,nd->n", gref, q_ref)
            dphi = jnp.where(jnp.abs(dphi) < 1e-30, 1.0, dphi)
            t = t - (val - goal) / dphi
            return t, None

        t0 = jnp.zeros((nd,), dtype=vertices.dtype)
        t, _ = jax.lax.scan(newton, t0, None, length=niter)

        # displacement, clamped to threshold * h (ref. shiftintegrators.cpp:107)
        disp = t[:, None] * q_phys  # (nd, d)
        if threshold >= 0:
            dn = jnp.linalg.norm(disp, axis=1)
            lim = threshold * h
            scale = jnp.where(dn > lim, lim / jnp.where(dn < 1e-30, 1.0, dn), 1.0)
            disp = disp * scale[:, None]

        # restrict to the band of marked elements (nodal union over the
        # DEFORM scalar dofs)
        active = jnp.zeros((nd,), dtype=bool)
        active = active.at[d_el2dof.reshape(-1)].max(
            jnp.broadcast_to(cutel[:, None], d_el2dof.shape).reshape(-1)
        )
        disp = jnp.where(active[:, None], disp, 0.0)

        # Newton convergence diagnostic on the active band
        ref_fin = pts + (t[:, None] * q_ref)[:, None, :]
        val_fin, _ = phi_and_grad(ref_fin)
        res = jnp.where(active, jnp.abs(val_fin - goal) / jnp.maximum(h, 1e-30),
                        0.0)
        # block layout of the vector space: [comp0 dofs; comp1 dofs; ...]
        return disp.T.reshape(-1), jnp.max(res)

    return jax.jit(kernel)


class LevelSetMeshAdaptation:
    """User-facing driver (cf. reference lsetcurving/lsetcurv.py:9-203)."""

    order_deform = None

    def __init__(self, mesh, order=2, lset_lower_bound=0, lset_upper_bound=0,
                 threshold=1.0, discontinuous_qn=True, heapsize=None,
                 periodic=False):
        self.mesh = mesh
        self.order = order
        self.threshold = threshold
        self.periodic = bool(periodic)
        self.ho_space = H1(mesh, order=order)
        self.p1_space = H1(mesh, order=1)
        if self.periodic:
            # unify deformation dofs across the periodic seam so both copies
            # get ONE Newton shift (reference wraps v_def in Periodic,
            # spacetime/lset_spacetime.py:51-52)
            from ..fem.space import Periodic, VectorFESpace

            self.deform_space = VectorFESpace(Periodic(H1(mesh, order=order)))
        else:
            self.deform_space = VectorH1(mesh, order=order)
        self.lset_ho = GridFunction(self.ho_space, "lset_ho")
        self.lset_p1 = GridFunction(self.p1_space, "lset_p1")
        self.deform = GridFunction(self.deform_space, "deform")
        self.levelset = None

    def CalcDeformation(self, levelset, blending=None, **kw):
        """Compute lset_ho, lset_p1 and the isoparametric deformation."""
        self.levelset = levelset
        self.lset_ho.Set(levelset)
        InterpolateToP1(self.lset_ho, self.lset_p1)
        return self._shift_from_nodal(self.lset_ho, self.lset_p1, self.deform,
                                      blending=blending)

    def _blending_alpha(self, lset_p1, blending):
        """Pointwise blending values at the deformation dof nodes
        (reference blending options, lsetcurving/lsetcurv.py:118-152)."""
        import numbers

        if blending is None or (isinstance(blending, str)
                                and blending == "none"):
            return jnp.zeros((len(self.deform_space.scalar.dof_rep_elem),),
                             dtype=config.dtype)
        from ..cf.coefficient import wrap, sqrt as cf_sqrt, specialcf
        from ..cf.context import EvalCtx, eval_pure
        from math import sqrt as msqrt

        if isinstance(blending, str):
            scale = msqrt(self.mesh.dim) * specialcf.mesh_size
            if blending == "quadratic":
                blending = lset_p1 * lset_p1 / (scale * scale)
            elif blending == "quartic":
                blending = (lset_p1 * lset_p1 * lset_p1 * lset_p1
                            / (scale * scale * scale * scale))
            else:
                raise ValueError(f"unknown blending {blending!r}")
        elif isinstance(blending, numbers.Number):
            blending = wrap(float(blending))
        cf = wrap(blending)
        dscal = self.deform_space.scalar
        rep_e = jnp.asarray(dscal.dof_rep_elem)
        rep_p = jnp.asarray(dscal.dof_rep_ref,
                            dtype=config.dtype)[:, None, :]
        ctx = EvalCtx(self.mesh, rep_p, elem_ids=rep_e)
        a = jnp.broadcast_to(eval_pure(cf, ctx), (rep_p.shape[0], 1))[:, 0]
        return jnp.clip(a, 0.0, 1.0)

    def _shift_from_nodal(self, lset_ho, lset_p1, deform, blending=None,
                          band=None):
        """ProjectShift step for given nodal lset_ho/lset_p1 GridFunctions;
        `band` optionally overrides the active element set (the space-time
        adaptation passes the union of IF elements over the slab)."""
        from ..jitcache import obj_uid

        # stable uids, not id(): a GC'd mesh's reused id() would fetch a
        # stale kernel with the old ndof baked in (and id keys pin nothing,
        # so the key can collide across rebuilt meshes in refinement loops)
        key = (obj_uid(self.mesh), obj_uid(self.deform_space), self.order,
               self.threshold)
        k = _PS_CACHE.get(key)
        if k is None:
            k = _project_shift_kernel(self.mesh, self.order, self.threshold)
            _PS_CACHE[key] = k
        if band is None:
            vperm = vertex_local_ids(self.mesh.et, 1)
            vv = np.asarray(lset_p1._arr)[self.p1_space.el2dof_np[:, vperm]]
            # absolute sign-collapsing zero guard (same convention as ops
            # eps_guard / reference straightcutrule.cpp:553-554)
            vv = np.where(np.abs(vv) < config.lset_eps, config.lset_eps, vv)
            band = (vv < 0).any(axis=1) & (vv > 0).any(axis=1)
        alpha = self._blending_alpha(lset_p1, blending)
        # dof nodes of the DEFORMATION scalar space (== ho_space for the
        # plain case; the periodic wrapper's representatives otherwise);
        # lset_ho is always gathered through ho_space's own el2dof
        dscal = self.deform_space.scalar
        vec, res = k(
            jnp.asarray(self.mesh.vertices_np, dtype=config.dtype),
            lset_ho._arr,
            jnp.asarray(self.p1_space.el2dof_np),
            lset_p1._arr,
            jnp.asarray(dscal.dof_rep_elem),
            jnp.asarray(dscal.dof_rep_ref, dtype=config.dtype),
            jnp.asarray(self.ho_space.el2dof_np),
            jnp.asarray(dscal.el2dof_np),
            jnp.asarray(self.mesh.elements_np),
            jnp.asarray(np.asarray(band, dtype=bool)),
            alpha,
        )
        if float(res) > 1e-6:
            import warnings

            from ..utils.diagnostics import NewtonNonConvergenceWarning

            warnings.warn(
                f"isoparametric shift Newton did not fully converge "
                f"(max |phi-goal|/h = {float(res):.2e}); the deformation is "
                f"threshold-clamped but may be less accurate (cf. reference "
                f"warning + fallback, symboliccutbfi.cpp:1184-1192)",
                NewtonNonConvergenceWarning)
        deform._set_array(vec)
        return deform

    def CalcMaxDistance(self, levelset=None, deform=None, heapsize=None,
                        order=None):
        """max |phi| over the deformed P1 zero set — the geometric distance
        estimate (cf. lsetcurving/calcgeomerrors.cpp; agrees with the true
        distance to first order when ||grad phi|| ~ 1 near the interface)."""
        from ..cf.coefficient import wrap

        levelset = levelset if levelset is not None else self.levelset
        lv = wrap(levelset)
        o = order if order is not None else 2 * self.order
        self.mesh.SetDeformation(self.deform if deform is None else deform)
        try:
            from ..integrate import _cut_ctx_and_weights
            from ..cf.context import eval_pure

            ctx, w_phys, mask = _cut_ctx_and_weights(
                self.mesh, self.lset_p1, 2, o
            )
            vals = eval_pure(lv, ctx)
            vals = jnp.broadcast_to(vals, w_phys.shape)
            dist = jnp.where(w_phys > 0, jnp.abs(vals), 0.0)
            return float(jnp.max(dist))
        finally:
            self.mesh.UnsetDeformation()

    def ProjectOnUpdate(self, gfs):
        pass

    def CalcDistances(self, levelset=None, order=None, stats=None):
        """Distance statistics of the deformed P1 zero set (cf. reference
        CalcDistances, lsetcurving/calcgeomerrors.cpp): returns
        (max, L1-mean, L2) of |phi| over the interface; with a
        StatisticContainer `stats`, appends the series ("max"/"L1"/"L2")."""
        from ..cf.coefficient import wrap
        from ..integrate import _cut_ctx_and_weights
        from ..cf.context import eval_pure

        levelset = levelset if levelset is not None else self.levelset
        lv = wrap(levelset)
        o = order if order is not None else 2 * self.order
        self.mesh.SetDeformation(self.deform)
        try:
            ctx, w_phys, mask = _cut_ctx_and_weights(self.mesh, self.lset_p1, 2, o)
            vals = jnp.abs(jnp.broadcast_to(eval_pure(lv, ctx), w_phys.shape))
            vals = jnp.where(w_phys > 0, vals, 0.0)
            tot = jnp.sum(w_phys)
            mx = float(jnp.max(vals))
            l1 = float(jnp.sum(vals * w_phys) / tot)
            l2 = float(jnp.sqrt(jnp.sum(vals * vals * w_phys) / tot))
            if stats is not None:
                stats.Add("max", mx)
                stats.Add("L1", l1)
                stats.Add("L2", l2)
            return mx, l1, l2
        finally:
            self.mesh.UnsetDeformation()

    def MarkForRefinement(self, levelset=None, refine_threshold=0.1,
                          absolute=False):
        """Mark elements whose interface geometry error exceeds the
        threshold for the next mesh.Refine() (reference lsetcurv.py
        MarkForRefinement / CalcDistances refinement flags,
        lsetcurving/calcgeomerrors.cpp)."""
        from ..cf.coefficient import wrap
        from ..integrate import _cut_ctx_and_weights
        from ..cf.context import eval_pure

        levelset = levelset if levelset is not None else self.levelset
        lv = wrap(levelset)
        self.mesh.SetDeformation(self.deform)
        try:
            ctx, w_phys, mask = _cut_ctx_and_weights(
                self.mesh, self.lset_p1, 2, 2 * self.order)
            vals = jnp.abs(jnp.broadcast_to(eval_pure(lv, ctx), w_phys.shape))
            vals = jnp.where(w_phys > 0, vals, 0.0)
            per_el = np.asarray(jnp.max(vals, axis=1))
        finally:
            self.mesh.UnsetDeformation()
        thresh = (refine_threshold if absolute
                  else refine_threshold * max(per_el.max(), 1e-300))
        marks = per_el > thresh
        self.mesh.SetRefinementFlags(marks)
        from ..fem.space import BitArray

        return BitArray(marks)


def RefineAtLevelSet(gf, lower=0.0, upper=0.0):
    """Mark elements cut by (or within [lower,upper] of) the level set for
    the next mesh.Refine() (reference lsetcurving/lsetrefine.cpp:13-42:
    element marked iff min(phi_vertices) <= upper and max >= lower)."""
    from ..integrate import lset_vertex_values

    vals = np.asarray(lset_vertex_values(gf))
    marks = (vals.min(axis=1) <= upper) & (vals.max(axis=1) >= lower)
    gf.space.mesh.SetRefinementFlags(marks)
    from ..fem.space import BitArray

    return BitArray(marks)


def _adapter_from_gfs(lset_ho, lset_p1, deform, threshold=1.0):
    """Internal: wrap existing GridFunctions in a LevelSetMeshAdaptation
    shell so the free-function bindings (reference
    lsetcurving/python_lsetcurving.cpp ProjectShift/CalcMaxDistance/
    CalcDistances) can reuse the class kernels."""
    self = LevelSetMeshAdaptation.__new__(LevelSetMeshAdaptation)
    self.mesh = lset_ho.space.mesh
    self.order = lset_ho.space.order
    self.threshold = threshold
    self.ho_space = lset_ho.space
    self.p1_space = lset_p1.space
    self.deform_space = deform.space if deform is not None else None
    self.lset_ho = lset_ho
    self.lset_p1 = lset_p1
    self.deform = deform
    self.levelset = lset_ho
    return self


def ProjectShift(lset_ho, lset_p1, deform, qn=None, active_elements=None,
                 blending=None, lower=0.0, upper=0.0, threshold=1.0,
                 heapsize=None):
    """Free-function shift projection (reference
    lsetcurving/python_lsetcurving.cpp:125-136, projshift.cpp:8-173):
    writes into `deform` the nodal shift mapping the lset_p1 zero set onto
    the lset_ho one.  `qn` (the quasi-normal CF) is unused: the batched
    Newton search takes its direction from grad(lset_ho) directly.
    [lower, upper] widen the active band; `active_elements` overrides it."""
    self = _adapter_from_gfs(lset_ho, lset_p1, deform, threshold)
    band = None
    if active_elements is not None:
        band = np.asarray(
            active_elements.np if hasattr(active_elements, "np")
            else active_elements, dtype=bool)
    elif lower != 0.0 or upper != 0.0:
        from ..integrate import lset_vertex_values

        vv = np.asarray(lset_vertex_values(lset_p1))
        band = (vv.min(axis=1) <= upper) & (vv.max(axis=1) >= lower)
    return self._shift_from_nodal(lset_ho, lset_p1, deform,
                                  blending=blending, band=band)


def CalcMaxDistance(lset, lset_p1, deform, heapsize=None):
    """Free-function max-distance estimate (reference
    lsetcurving/python_lsetcurving.cpp:49-60): max |lset| over the deformed
    lset_p1 zero set."""
    self = _adapter_from_gfs(
        lset if hasattr(lset, "space") else lset_p1, lset_p1, deform)
    if not hasattr(lset, "space") and deform is not None:
        self.order = deform.space.order  # quadrature order for a CF levelset
    return self.CalcMaxDistance(levelset=lset, deform=deform)


def CalcDistances(lset, lset_p1, deform, stats=None, heapsize=None,
                  refine_threshold=-1.0, absolute=False):
    """Free-function distance statistics (reference
    lsetcurving/python_lsetcurving.cpp:99-110): (max, L1, L2) of |lset|
    over the deformed lset_p1 zero set; appends to `stats` when given and
    sets refinement flags when refine_threshold >= 0."""
    self = _adapter_from_gfs(
        lset if hasattr(lset, "space") else lset_p1, lset_p1, deform)
    if not hasattr(lset, "space") and deform is not None:
        self.order = deform.space.order  # quadrature order for a CF levelset
    out = self.CalcDistances(levelset=lset, stats=stats)
    if refine_threshold >= 0:
        self.MarkForRefinement(levelset=lset,
                               refine_threshold=refine_threshold,
                               absolute=absolute)
    return out
