"""SFESpace — 1D polynomials living on the level-set zero line (2D).

Port of the reference's experimental surface space (``xfem/sFESpace.hpp:12-68``,
``sFESpace.cpp:9-145``, ``SFiniteElement`` in ``xfiniteelement.cpp:34-53``):
per cut TRIG element the interface is the segment between the two edge cut
points; the element carries order+1 (discontinuous) dofs whose shapes are the
1D basis evaluated at the orthogonal projection onto that segment's chord
parametrization — constant in the normal direction.  Batched: cut points are
computed for ALL elements at once from the P1 level-set vertex values; shape
evaluation is a fused projection + 1D basis matmul.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import config
from .space import BitArray
from .basis import shapes
from ..forms.evaluate import Factor
from ..cf.coefficient import CF


class SFESpace:
    """Space of 1D polynomials on the zero line of a P1 level set (TRIGs)."""

    vdim = 1
    is_compound = False

    def __init__(self, mesh, levelset, order: int = 1, **kw):
        from ..integrate import lset_vertex_values
        from ..fem.gridfunction import GridFunction, InterpolateToP1
        from .space import H1

        if mesh.et != "trig":
            raise NotImplementedError("SFESpace: only TRIG meshes (as in the "
                                      "reference, sFESpace.cpp:86)")
        self.mesh = mesh
        self.order = int(order)
        self.dgjumps = False
        if not hasattr(levelset, "space"):
            gf = GridFunction(H1(mesh, order=1))
            InterpolateToP1(levelset, gf)
            levelset = gf
        self.levelset = levelset

        vals = np.asarray(lset_vertex_values(levelset))  # (E, 3)
        from ..ops.cuttables import REF_VERTS

        refv = REF_VERTS["trig"]  # (3, 2)
        edges = [(0, 1), (0, 2), (1, 2)]  # reference order (sFESpace.cpp:111)
        E = mesh.ne
        cuts = np.zeros((E, 2, 2))
        sels, pts = [], []
        for (a, b) in edges:
            la, lb = vals[:, a], vals[:, b]
            sel = ((la > 0) & (lb <= 0)) | ((la <= 0) & (lb > 0))
            t = np.where(sel, -la / np.where(lb - la == 0, 1.0, lb - la), 0.0)
            pts.append((1 - t)[:, None] * refv[a][None]
                       + t[:, None] * refv[b][None])
            sels.append(sel)
        selm = np.stack(sels, axis=1)             # (E, 3)
        slot = np.cumsum(selm, axis=1) - selm     # cut edges BEFORE edge k
        ncut = selm.sum(axis=1)
        for k in range(3):  # first two cut edges in reference order
            m = sels[k] & (slot[:, k] < 2)
            cuts[np.nonzero(m)[0], slot[m, k]] = pts[k][m]
        self.active = ncut >= 2
        nact = int(self.active.sum())
        ndl = self.order + 1
        self.ndof = nact * ndl
        # element -> dofs (padded 0 for inactive, masked in evaluation)
        first = np.zeros(E, dtype=np.int64)
        first[self.active] = np.arange(nact) * ndl
        self.el2dof_np = np.where(
            self.active[:, None], first[:, None] + np.arange(ndl)[None], 0
        ).astype(np.int32)
        self.el2dof = jnp.asarray(self.el2dof_np)
        self.eldof_active = jnp.asarray(
            np.broadcast_to(self.active[:, None], (E, ndl)).copy())
        self.cuts = jnp.asarray(cuts, dtype=config.dtype)  # (E, 2, 2)
        self.dirichlet_dofs = np.zeros(self.ndof, dtype=bool)
        self.bc_of_dof = np.zeros(self.ndof, dtype=np.int32)

    # -- NGSolve-ish API ------------------------------------------------------
    def FreeDofs(self, coupling=False):
        return BitArray(~self.dirichlet_dofs)

    def TrialFunction(self):
        from ..forms.proxies import make_proxies

        return make_proxies(self, test=False)

    def TestFunction(self):
        from ..forms.proxies import make_proxies

        return make_proxies(self, test=True)

    def TnT(self):
        return self.TrialFunction(), self.TestFunction()

    def CutElements(self) -> BitArray:
        return BitArray(self.active)

    # -- evaluation -----------------------------------------------------------
    def _xhat(self, ctx, pctx):
        cuts = pctx.lookup(self, "cuts", self.cuts)
        if pctx.elem_ids is not None:
            cuts = cuts[pctx.elem_ids]
        c0 = cuts[:, None, 0, :]  # (E,1,2)
        dref = cuts[:, None, 1, :] - c0
        den = jnp.sum(dref * dref, axis=-1)
        den = jnp.where(den < 1e-30, 1.0, den)
        return jnp.sum((pctx.ref_pts - c0) * dref, axis=-1) / den  # (E,Q)

    def proxy_factor_hook(self, proxy, ctx, pctx):
        if proxy.op != "val":
            raise NotImplementedError(
                "SFESpace supports value evaluation only (the reference "
                "SFiniteElement::CalcDShape also throws)")
        xhat = self._xhat(ctx, pctx)
        B = shapes("segm", self.order, xhat[..., None])  # (E,Q,ndl)
        act = pctx.lookup(self, "eldof_active", self.eldof_active)
        if pctx.elem_ids is not None:
            act = act[pctx.elem_ids]
        B = jnp.where(act[:, None, :], B, 0.0)
        return Factor(block=proxy.block_key, arr=B, space=self)

    def gf_eval_hook(self, gf, ctx, **kw):
        return _SGFOp(gf)._eval_pure(ctx)

    def __repr__(self):
        return f"SFESpace(order={self.order}, ndof={self.ndof})"


class _SGFOp(CF):
    """CF node: evaluate a GridFunction on an SFESpace."""

    def __init__(self, gf):
        self.gf = gf
        self.dims = ()

    def _signature(self, slots):
        from ..jitcache import obj_uid, register_space

        s = slots.slot(self.gf, "vec", lambda g=self.gf: g._arr)
        register_space(self.gf.space, slots)
        return ("sgf", obj_uid(self.gf.space), s)

    def _eval_pure(self, ctx):
        sp = self.gf.space
        vec = ctx.lookup(self.gf, "vec", self.gf._arr)
        e2d = ctx.lookup(sp, "el2dof", sp.el2dof)
        act = ctx.lookup(sp, "eldof_active", sp.eldof_active)
        if ctx.elem_ids is not None:
            e2d = e2d[ctx.elem_ids]
            act = act[ctx.elem_ids]
        xhat = sp._xhat(ctx, ctx)
        B = shapes("segm", sp.order, xhat[..., None])
        dofs = jnp.where(act, vec[e2d], 0.0)
        return jnp.einsum("eqi,ei->eq", B, dofs)
