"""XFESpace — Heaviside-enrichment space for XFEM.

Re-design of the reference enrichment space (``xfem/xFESpace.hpp:22-206``,
dof maps ``xFESpace.cpp:302-321``, sign assignment ``:345-366``, masked
diff-ops ``xfem/xfemdiffops.cpp:7-67``): an x-dof doubles a base dof on cut
elements; its enrichment function is  psi_i = phi_i * chi_{dom(i)}  with
dom(i) = the domain NOT containing the dof's node (INVERT of the node's
side).  Because a node's support elements never lie in the opposite uncut
domain, psi_i is supported on cut elements only — so the dof set is exactly
"base dofs of IF elements" and evaluation is a *sign mask* on the base basis
(a jnp.where, not a custom element type).

Operators (python/__init__.py:22-105 of the reference):
  extend(u)      base shapes, unmasked
  neg(u)/pos(u)  base shapes masked to dofs enriching NEG/POS
  *_grad         the corresponding gradients
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import config
from ..domaintype import IF, NEG, POS
from .space import FESpace, BitArray
from .basis import shapes, dshapes
from ..forms.evaluate import Factor
from ..cf.coefficient import CF


class XFESpace:
    """Enrichment space over a scalar base FESpace."""

    def __init__(self, basefes: FESpace, lset_or_cutinfo=None, cutinfo=None,
                 trace=False, **kw):
        from ..geom.cutinfo import CutInfo
        from .gridfunction import GridFunction

        self.base = basefes
        self.mesh = basefes.mesh
        self.order = basefes.order
        self.trace = trace
        if isinstance(lset_or_cutinfo, CutInfo):
            self.cutinfo = lset_or_cutinfo
        else:
            self.cutinfo = CutInfo(self.mesh, lset_or_cutinfo)
        if cutinfo is not None:
            self.cutinfo = cutinfo

        # level-set value at every base dof node -> dof side
        lset = getattr(self.cutinfo, "_lset_gf", None)
        if lset is None:
            raise ValueError("XFESpace needs the level set (GridFunction)")
        tmp = GridFunction(basefes)
        tmp.Set(lset)
        phi_at_dofs = np.asarray(tmp._arr)
        # dom of xdof = INVERT(side of node): node in NEG -> enriches POS
        self.dom_of_basedof = np.where(phi_at_dofs < 0, int(POS), int(NEG)).astype(
            np.int8
        )

        cutels = self.cutinfo.GetElementsOfType(IF).np
        active = np.zeros(basefes.ndof, dtype=bool)
        active[basefes.el2dof_np[cutels].ravel()] = True
        self.basedof2xdof = np.full(basefes.ndof, -1, dtype=np.int32)
        self.xdof2basedof = np.nonzero(active)[0].astype(np.int32)
        self.basedof2xdof[self.xdof2basedof] = np.arange(
            len(self.xdof2basedof), dtype=np.int32
        )
        self.ndof = int(active.sum())
        mapped = self.basedof2xdof[basefes.el2dof_np]
        self.el2dof_np = np.where(mapped >= 0, mapped, 0).astype(np.int32)
        # placeholder-0 slots are NOT dof 0; set algebra must skip them
        self.el2dof_valid_np = mapped >= 0
        self.el2dof = jnp.asarray(self.el2dof_np)
        # per-element-local dof signs (static geometry data for the factor mask)
        self.eldof_dom = jnp.asarray(
            self.dom_of_basedof[basefes.el2dof_np].astype(np.int32)
        )
        # inactive base dofs must never contribute: extra mask
        self.eldof_active = jnp.asarray(mapped >= 0)
        self.dom_of_xdof = self.dom_of_basedof[self.xdof2basedof]
        # Dirichlet-where-the-cut-touches-the-boundary (xFESpace.cpp:368-399):
        # an enrichment dof is Dirichlet iff its base dof is Dirichlet AND it
        # has support on a boundary element crossed by the interface.
        self.dirichlet_dofs = np.zeros(self.ndof, dtype=bool)
        mesh = basefes.mesh
        if len(mesh.boundary_facets_np) and getattr(
                self.cutinfo, "dt_of_belem", None) is not None:
            from ..geom.cutinfo import IF as _IF, BND as _BND

            bnd_if = self.cutinfo.GetElementsOfType(_IF, VOL_or_BND=_BND).np
            if bnd_if.any() and basefes.dirichlet_dofs.any():
                lfn = basefes._local_facet_nodes()
                cut_on_bnd = np.zeros(self.ndof, dtype=bool)
                bfs = mesh.boundary_facets_np[bnd_if]
                e = mesh.facet2el_np[bfs, 0]
                lf = mesh.facet2elloc_np[bfs, 0]
                for loc, ids in enumerate(lfn):
                    sel = lf == loc
                    if sel.any() and len(ids):
                        xd = self.basedof2xdof[
                            basefes.el2dof_np[e[sel]][:, ids].ravel()]
                        cut_on_bnd[xd[xd >= 0]] = True
                self.dirichlet_dofs = (
                    cut_on_bnd & basefes.dirichlet_dofs[self.xdof2basedof])
        self.bc_of_dof = np.zeros(self.ndof, dtype=np.int32)
        self.dgjumps = basefes.dgjumps
        self.vdim = 1

        # trace-dof condensation marks (reference xFESpace.cpp:72-97): with
        # trace=True in 3D, face-interior dofs of faces adjacent to <2 cut
        # elements (the outer rim of the band) become LOCAL_DOF — they only
        # carry stabilization coupling and can be statically condensed
        # (solvers/condense.py).
        self.local_dofs = np.zeros(self.ndof, dtype=bool)
        if trace and self.mesh.dim == 3 and self.order >= 1:
            fnodes = _facet_interior_nodes(self.mesh.et, self.order)
            f2e = self.mesh.facet2el_np
            cut = np.asarray(cutels)
            nb = cut[f2e[:, 0]].astype(np.int32) + np.where(
                f2e[:, 1] >= 0, cut[np.maximum(f2e[:, 1], 0)], 0
            )
            weak = nb < 2  # faces on the outer rim of the cut band
            for lf, nodeids in enumerate(fnodes):
                if len(nodeids) == 0:
                    continue
                sel = np.nonzero(weak[self.mesh.el2facet_np[:, lf]])[0]
                if len(sel) == 0:
                    continue
                bds = basefes.el2dof_np[np.ix_(sel, np.asarray(nodeids))]
                xd = self.basedof2xdof[bds.ravel()]
                self.local_dofs[xd[xd >= 0]] = True

    def LocalDofs(self) -> BitArray:
        """Dofs marked LOCAL_DOF for static condensation (trace=True)."""
        return BitArray(self.local_dofs)

    def GetCutInfo(self):
        return self.cutinfo

    def BaseDofOfXDof(self, i):
        """Base-space dof of extended dof ``i`` (xFESpace.hpp
        GetBaseDofOfXDof)."""
        return int(self.xdof2basedof[i])

    def GetDomainOfDof(self, i):
        """Domain (NEG/POS) of extended dof ``i`` (xFESpace.cpp
        GetDomainOfDof): the side the enrichment has support on."""
        from ..domaintype import DOMAIN_TYPE

        return DOMAIN_TYPE(int(self.dom_of_xdof[i]))

    def GetDomainNrs(self, elnr):
        """Domains of the extended dofs on (cut) element ``elnr`` in
        element-local dof order; empty when the element is not cut
        (xFESpace.cpp:30-42)."""
        from ..domaintype import DOMAIN_TYPE, IF

        if not bool(self.cutinfo.GetElementsOfType(IF).np[elnr]):
            return []
        xdofs = self.el2dof_np[elnr][self.el2dof_valid_np[elnr]]
        return [DOMAIN_TYPE(int(d)) for d in self.dom_of_xdof[xdofs]]

    def gf_eval_hook(self, gf, ctx, **kw):
        """Default GF evaluation = `extend` (active-masked base basis)."""
        return _XGFOp(gf, None)._eval_pure(ctx)

    def FreeDofs(self, coupling=False):
        """Free dofs; with coupling=True, LOCAL (condensable) dofs are
        excluded — NGSolve's FreeDofs(True) convention for condensed solves."""
        free = ~self.dirichlet_dofs
        if coupling:
            free = free & ~self.local_dofs
        return BitArray(free)

    def TrialFunction(self):
        from ..forms.proxies import make_proxies

        return make_proxies(self, test=False)

    def TestFunction(self):
        from ..forms.proxies import make_proxies

        return make_proxies(self, test=True)

    def TnT(self):
        return self.TrialFunction(), self.TestFunction()

    # -- factor hook used by forms/evaluate.proxy_factor ---------------------
    def proxy_factor_hook(self, proxy, ctx, pctx):
        et, order = self.mesh.et, self.order
        op = proxy.op
        if op in ("val", "xext"):
            arr, side = shapes(et, order, pctx.ref_pts), None
        elif op == "xneg":
            arr, side = shapes(et, order, pctx.ref_pts), int(NEG)
        elif op == "xpos":
            arr, side = shapes(et, order, pctx.ref_pts), int(POS)
        elif op in ("grad", "xextgrad", "xneggrad", "xposgrad"):
            G = dshapes(et, order, pctx.ref_pts)
            arr = jnp.einsum("eqid,eqdg->eqig", G, pctx.Jinv)
            side = {"xneggrad": int(NEG), "xposgrad": int(POS)}.get(op)
        else:
            raise NotImplementedError(f"XFESpace proxy op {op}")
        dom = pctx.lookup(self, "eldof_dom", self.eldof_dom)
        act = pctx.lookup(self, "eldof_active", self.eldof_active)
        if pctx.elem_ids is not None:
            dom = dom[pctx.elem_ids]
            act = act[pctx.elem_ids]
        mask = act if side is None else (act & (dom == side))
        m = mask[:, None, :]
        if arr.ndim == 4:
            m = m[..., None]
        arr = jnp.where(m, arr, 0.0)
        return Factor(block=proxy.block_key, arr=arr, space=self)

    def __repr__(self):
        return f"XFESpace(ndof={self.ndof}, base={self.base})"


def _facet_interior_nodes(et: str, order: int):
    """Per local facet: the face-bubble (NT_FACET interior) node dofs used
    by the reference trace flag (shared helper, fem/basis.facet_local_nodes
    with interior_only=True — verified identical to the former
    plane-distance construction for trig/tet/quad/hex, orders 1-3)."""
    from .basis import facet_local_nodes

    return facet_local_nodes(et, order, interior_only=True)


class _XGFOp(CF):
    """CF node: masked evaluation of a GridFunction on an XFESpace."""

    def __init__(self, gf, side, grad=False):
        self.gf = gf
        self.side = side  # None = extend
        self.grad = grad
        sp = gf.space
        self.dims = (sp.mesh.dim,) if grad else ()

    def _signature(self, slots):
        from ..jitcache import obj_uid, register_space

        s = slots.slot(self.gf, "vec", lambda g=self.gf: g._arr)
        register_space(self.gf.space, slots)
        return ("xgf", obj_uid(self.gf.space), self.side, self.grad, s)

    def _eval_pure(self, ctx):
        sp = self.gf.space
        et, order = sp.mesh.et, sp.order
        vec = ctx.lookup(self.gf, "vec", self.gf._arr)
        e2d = ctx.lookup(sp, "el2dof", sp.el2dof)
        dom = ctx.lookup(sp, "eldof_dom", sp.eldof_dom)
        act = ctx.lookup(sp, "eldof_active", sp.eldof_active)
        if ctx.elem_ids is not None:
            e2d = e2d[ctx.elem_ids]
            dom = dom[ctx.elem_ids]
            act = act[ctx.elem_ids]
        mask = act if self.side is None else (act & (dom == self.side))
        dofs = jnp.where(mask, vec[e2d], 0.0)  # (E, ndl)
        if not self.grad:
            B = shapes(et, order, ctx.ref_pts)
            return jnp.einsum("eqi,ei->eq", B, dofs)
        G = dshapes(et, order, ctx.ref_pts)
        gref = jnp.einsum("eqid,ei->eqd", G, dofs)
        return jnp.einsum("eqd,eqdg->eqg", gref, ctx.Jinv)


def _xop(obj, op_name, side, grad):
    from ..forms.proxies import ProxyFunction
    from .gridfunction import GridFunction

    if isinstance(obj, ProxyFunction):
        if not isinstance(obj.space, XFESpace):
            raise TypeError(f"{op_name} needs an XFESpace function")
        d = obj.space.mesh.dim
        return obj._clone(op=op_name, dims=(d,) if grad else ())
    if isinstance(obj, GridFunction) and isinstance(obj.space, XFESpace):
        return _XGFOp(obj, side, grad)
    raise TypeError(f"{op_name} expects an XFESpace proxy or GridFunction")


def neg(u):
    return _xop(u, "xneg", int(NEG), False)


def pos(u):
    return _xop(u, "xpos", int(POS), False)


def extend(u):
    return _xop(u, "xext", None, False)


def neg_grad(u):
    return _xop(u, "xneggrad", int(NEG), True)


def pos_grad(u):
    return _xop(u, "xposgrad", int(POS), True)


def extend_grad(u):
    return _xop(u, "xextgrad", None, True)


def XToNegPos(gfx, gfnegpos):
    """Copy an XFESpace GridFunction into a two-field compound representation
    (cf. xfem/xFESpace.cpp:105-144)."""
    sp = gfx.space
    neg_part = np.zeros(sp.base.ndof)
    pos_part = np.zeros(sp.base.ndof)
    vec = np.asarray(gfx._arr)
    bd = np.asarray(sp.xdof2basedof)
    is_neg = np.asarray(sp.dom_of_xdof) == int(NEG)
    neg_part[bd[is_neg]] = vec[is_neg]
    pos_part[bd[~is_neg]] = vec[~is_neg]
    gfnegpos.components[0].vec = jnp.asarray(neg_part, dtype=config.dtype)
    gfnegpos.components[1].vec = jnp.asarray(pos_part, dtype=config.dtype)
