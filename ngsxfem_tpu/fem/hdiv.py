"""H(div) space — lowest-order Raviart-Thomas (RT0) with Piola mapping.

The reference uses NGSolve's HDiv spaces in two places: as a facet-normal
orientation helper (``tests/pytests/test_straightcutrule.py:338``,
``HDiv(mesh, order=0)``) and through the HDiv variant of the ghost-penalty
normal-derivative diff-op ``DiffOpDuDnkHDiv``
(``xfem/ghostpenalty.hpp:27-41``, ``ghostpenalty.cpp:140-199``).  This
module provides the batched TPU equivalents: one dof per facet (global
outward-flux convention, oriented by the first adjacent element), Piola
value/div evaluation, and an EXACT directional normal derivative (the
shapes are polynomials; sampling along the normal line and differentiating
the interpolant replaces the reference's central FD stencils).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import config
from .space import BitArray
from ..forms.evaluate import Factor
from ..cf.coefficient import CF


# RT0 reference basis scale: psi_i = C_RT0[d] * (xi - V_opp(i)), dof = flux
# through reference facet i w.r.t. the outward reference normal
_C_RT0 = {2: 1.0, 3: 2.0}


class HDiv:
    """RT0 H(div) space on simplicial meshes (one dof per facet)."""

    vdim = None  # vector-valued; set to mesh.dim in __init__
    is_compound = False

    def __init__(self, mesh, order: int = 0, dirichlet=None, **kw):
        if mesh.et not in ("trig", "tet"):
            raise NotImplementedError("HDiv: simplicial meshes only")
        if order != 0:
            raise NotImplementedError(
                "HDiv order>0 (BDM/RT_k families) is not implemented; the "
                "reference usage (normal helper, DuDnkHDiv ghost penalty) "
                "is covered by RT0")
        self.mesh = mesh
        self.order = order
        self.dim = mesh.dim
        self.vdim = mesh.dim
        self.dgjumps = False
        self.ndof = mesh.nfacets
        self.el2dof_np = mesh.el2facet_np.astype(np.int32)
        self.el2dof = jnp.asarray(self.el2dof_np)
        # orientation: +1 where this element is the facet's first neighbor
        f2e = mesh.facet2el_np
        sign = np.where(
            f2e[self.el2dof_np, 0] == np.arange(mesh.ne)[:, None], 1.0, -1.0)
        self.eldof_sign = jnp.asarray(sign, dtype=config.dtype)
        # opposite reference vertex per local facet
        from ..mesh.mesh import FACET_VERTS
        from ..ops.cuttables import REF_VERTS

        refv = REF_VERTS[mesh.et]
        nvel = refv.shape[0]
        opp = []
        for fv in FACET_VERTS[mesh.et]:
            (m,) = set(range(nvel)) - set(fv)
            opp.append(m)
        self.v_opp = jnp.asarray(refv[np.asarray(opp)], dtype=config.dtype)
        self.dirichlet_dofs = np.zeros(self.ndof, dtype=bool)
        self.bc_of_dof = np.zeros(self.ndof, dtype=np.int32)

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

    # -- shape machinery ------------------------------------------------------
    def _piola(self, pctx, ref_pts):
        """Piola-mapped RT0 shapes at ref_pts (E,Q,d) -> (E,Q,nfel,d) plus
        the constant divergence (E,Q,nfel)."""
        from ..mesh.mesh import geom_dshapes

        c = _C_RT0[self.dim]
        # psi_ref (E,Q,nfel,d)
        psi_ref = c * (ref_pts[:, :, None, :] - self.v_opp[None, None, :, :])
        J = pctx.J  # (E,Q,g,d): J[g,d] = dx_g/dxi_d (map_points layout)
        # |det|: with a signed det, negatively-oriented elements would flip
        # the outward-flux dof meaning (Kuhn tet splits contain both signs)
        detJ = jnp.abs(pctx.detJ)
        inv_det = 1.0 / jnp.where(detJ < 1e-30, 1.0, detJ)
        psi = jnp.einsum("eqid,eqgd->eqig", psi_ref, J) * inv_det[..., None, None]
        div = (c * self.dim) * inv_det  # (E,Q)
        div = jnp.broadcast_to(div[..., None], psi.shape[:3])
        sign = pctx.lookup(self, "eldof_sign", self.eldof_sign)
        if pctx.elem_ids is not None:
            sign = sign[pctx.elem_ids]
        psi = psi * sign[:, None, :, None]
        div = div * sign[:, None, :]
        return psi, div

    def proxy_factor_hook(self, proxy, ctx, pctx):
        op = proxy.op
        if op == "val":
            psi, _ = self._piola(pctx, pctx.ref_pts)
            return Factor(block=proxy.block_key, arr=psi, space=self)
        if op == "div":
            _, dv = self._piola(pctx, pctx.ref_pts)
            return Factor(block=proxy.block_key, arr=dv, space=self)
        if op == "dnk":
            return Factor(block=proxy.block_key,
                          arr=self._dnk(pctx, proxy.op_args[0]), space=self)
        raise NotImplementedError(f"HDiv proxy op {op}")

    def _dnk(self, pctx, k: int):
        """k-th directional derivative of the vector shapes along the facet
        normal (DiffOpDuDnkHDiv, ghostpenalty.cpp:140-199) — exact: RT0
        shapes are degree-1 polynomials, so a 2-point interpolant suffices.
        Returns (E,Q,nfel,d)."""
        from math import factorial

        p = self.order + 1  # polynomial degree of the shapes
        n = pctx.normal
        if n is None:
            raise TypeError("dn(..., hdiv=True) needs a facet-normal context")
        dir_ref = jnp.einsum("eqdg,eqg->eqd", pctx.Jinv, n)
        tn = np.cos(np.pi * (2 * np.arange(p + 1) + 1) / (2 * (p + 1)))
        V = np.vander(tn, increasing=True)
        wk = factorial(k) * np.linalg.inv(V)[k] if k <= p else np.zeros(p + 1)
        pts = (pctx.ref_pts[:, :, None, :]
               + tn[None, None, :, None] * dir_ref[:, :, None, :])  # (E,Q,t,d)
        E, Q, T, d = pts.shape
        flat = pts.reshape(E, Q * T, d)
        # J/detJ are constant per (affine) element: reuse pctx jacobians
        c = _C_RT0[self.dim]
        psi_ref = c * (flat[:, :, None, :] - self.v_opp[None, None, :, :])
        J = pctx.J[:, :1]  # (E,1,g,d) affine
        detJ = jnp.abs(pctx.detJ[:, :1])
        inv_det = 1.0 / jnp.where(detJ < 1e-30, 1.0, detJ)
        psi = jnp.einsum("eqid,eagd->eqig", psi_ref, J) * inv_det[..., None, None]
        psi = psi.reshape(E, Q, T, psi.shape[2], d)
        sign = pctx.lookup(self, "eldof_sign", self.eldof_sign)
        if pctx.elem_ids is not None:
            sign = sign[pctx.elem_ids]
        psi = psi * sign[:, None, None, :, None]
        wkj = jnp.asarray(wk, dtype=psi.dtype)
        return jnp.einsum("t,eqtid->eqid", wkj, psi)

    def gf_eval_hook(self, gf, ctx, **kw):
        return _HDivGFOp(gf)._eval_pure(ctx)

    def __repr__(self):
        return f"HDiv(order={self.order}, ndof={self.ndof})"


class _HDivGFOp(CF):
    """CF node: evaluate an HDiv GridFunction (vector-valued)."""

    def __init__(self, gf):
        self.gf = gf
        self.dims = (gf.space.dim,)

    def _signature(self, slots):
        from ..jitcache import obj_uid, register_space

        s = slots.slot(self.gf, "vec", lambda g=self.gf: g._arr)
        register_space(self.gf.space, slots)
        return ("hdivgf", obj_uid(self.gf.space), s)

    def _eval_pure(self, ctx):
        sp = self.gf.space
        vec = ctx.lookup(self.gf, "vec", self.gf._arr)
        e2d = ctx.lookup(sp, "el2dof", sp.el2dof)
        if ctx.elem_ids is not None:
            e2d = e2d[ctx.elem_ids]
        psi, _ = sp._piola(ctx, ctx.ref_pts)  # (E,Q,nfel,d)
        dofs = vec[e2d]  # (E, nfel)
        return jnp.einsum("eqid,ei->eqd", psi, dofs)
