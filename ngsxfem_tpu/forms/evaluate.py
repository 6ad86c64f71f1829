"""Bilinear-jet form evaluation.

Where NGSolve's symbolic framework linearizes integrands w.r.t. proxies by
repeated evaluation (reference hot loop ``xfem/symboliccutbfi.cpp:151-215``),
we propagate a *bilinear jet* through the CF graph in one pass: every value is
a sum of terms  ``scalar * cfree ⊗ (u-factor) ⊗ (v-factor)`` with factor
tensors carrying the element-dof axis.  The element matrix then falls out as
one einsum per term — a batched B·D·Bᵀ that XLA tiles onto the MXU (the
batched analog of the reference's blocked AddABt, symboliccutbfi.cpp:246-276).
"""
from __future__ import annotations

from dataclasses import dataclass, replace
from math import factorial
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..cf import coefficient as C
from ..cf.context import EvalCtx, eval_pure, _full, _bc
from ..fem.basis import shapes, dshapes
from .proxies import ProxyFunction


@dataclass
class Factor:
    block: tuple  # (compound block index, other flag)
    arr: jnp.ndarray  # (E, Q, ndof_el, *comps)
    space: object  # the (component) FESpace this factor belongs to


@dataclass
class Term:
    scalar: jnp.ndarray  # broadcastable to (E, Q)
    cfree: Optional[jnp.ndarray] = None  # (E, Q, *S) free comps on coefficient
    ufac: Optional[Factor] = None
    vfac: Optional[Factor] = None
    contracted: bool = False  # ufac/vfac trailing axis contracted pairwise

    def comp_loc(self):
        if self.cfree is not None:
            return "c"
        if self.contracted:
            return None
        if self.ufac is not None and self.ufac.arr.ndim > 3:
            return "u"
        if self.vfac is not None and self.vfac.arr.ndim > 3:
            return "v"
        return None

    def comps(self):
        loc = self.comp_loc()
        if loc == "c":
            return self.cfree.shape[2:]
        if loc == "u":
            return self.ufac.arr.shape[3:]
        if loc == "v":
            return self.vfac.arr.shape[3:]
        return ()


def term_mul(t1: Term, t2: Term, c: int) -> Term:
    if t1.ufac is not None and t2.ufac is not None:
        raise TypeError("form is nonlinear in the trial function")
    if t1.vfac is not None and t2.vfac is not None:
        raise TypeError("form is nonlinear in the test function")
    scalar = t1.scalar * t2.scalar
    if c == 0:
        cfree = t1.cfree if t1.cfree is not None else t2.cfree
        if t1.cfree is not None and t2.cfree is not None:
            raise TypeError("product of two component-valued terms without contraction")
        return Term(
            scalar=scalar,
            cfree=cfree,
            ufac=t1.ufac or t2.ufac,
            vfac=t1.vfac or t2.vfac,
            contracted=t1.contracted or t2.contracted,
        )

    loc1, loc2 = t1.comp_loc(), t2.comp_loc()
    S1, S2 = t1.comps(), t2.comps()
    if loc1 is None or loc2 is None:
        raise TypeError("contraction with a scalar term")
    keep1, keep2 = S1[: len(S1) - c], S2[: len(S2) - c]
    if S1[len(S1) - c:] != S2[len(S2) - c:]:
        raise TypeError(f"contraction dims mismatch {S1} vs {S2}")

    def get(t, loc):
        return t.cfree if loc == "c" else (t.ufac.arr if loc == "u" else t.vfac.arr)

    a1, a2 = get(t1, loc1), get(t2, loc2)

    # flatten: free dims then contracted axis
    def prep(a, nfree_keep, has_dof):
        # a: (E,Q,[n],*keep,*con) -> (E,Q,[n],K,X)
        base = 3 if has_dof else 2
        keep = a.shape[base: a.ndim - c]
        kn = int(np.prod(keep)) if keep else 1
        xn = int(np.prod(a.shape[a.ndim - c:]))
        return a.reshape(a.shape[:base] + (kn, xn)), keep

    has1, has2 = loc1 != "c", loc2 != "c"
    f1, keep_sh1 = prep(a1, keep1, has1)
    f2, keep_sh2 = prep(a2, keep2, has2)

    if loc1 != "c" and loc2 != "c":
        # u-v contraction: must be full (scalar result)
        if keep1 or keep2:
            raise TypeError("partial u-v contraction unsupported; expand the form")
        arr1 = f1[..., 0, :]  # (E,Q,n,X)
        arr2 = f2[..., 0, :]
        new1 = replace(t1.ufac or t1.vfac, arr=arr1)
        new2 = replace(t2.ufac or t2.vfac, arr=arr2)
        ufac = new1 if loc1 == "u" else new2
        vfac = new1 if loc1 == "v" else new2
        return Term(scalar=scalar, ufac=ufac, vfac=vfac, contracted=True)

    # coefficient on one side: absorb contraction into the other carrier
    if loc1 == "c" and loc2 == "c":
        out = jnp.einsum("eqkx,eqlx->eqkl", f1, f2)
        out = out.reshape(out.shape[:2] + keep_sh1 + keep_sh2)
        if out.ndim == 2:
            return Term(scalar=scalar * out, ufac=t1.ufac or t2.ufac,
                        vfac=t1.vfac or t2.vfac,
                        contracted=t1.contracted or t2.contracted)
        return Term(scalar=scalar, cfree=out, ufac=t1.ufac or t2.ufac,
                    vfac=t1.vfac or t2.vfac,
                    contracted=t1.contracted or t2.contracted)
    # one factor-carried, one coefficient-carried
    if loc1 == "c":
        fc, kc = f1, keep_sh1
        ff, kf = f2, keep_sh2
        tf, locf = t2, loc2
        order = "cf"
    else:
        ff, kf = f1, keep_sh1
        fc, kc = f2, keep_sh2
        tf, locf = t1, loc1
        order = "fc"
    out = jnp.einsum("eqnkx,eqlx->eqnkl", ff, fc)
    # free dims order: S1-keeps then S2-keeps
    if order == "cf":
        out = jnp.swapaxes(out, -1, -2)
        keeps = kc + kf
    else:
        keeps = kf + kc
    out = out.reshape(out.shape[:3] + keeps)
    if out.ndim == 3:
        pass  # scalar factor
    fac = replace(tf.ufac if locf == "u" else tf.vfac, arr=out)
    return Term(
        scalar=scalar,
        ufac=fac if locf == "u" else (t1.ufac or t2.ufac),
        vfac=fac if locf == "v" else (t1.vfac or t2.vfac),
        contracted=t1.contracted or t2.contracted,
    )


# ---------------------------------------------------------------------------
# proxy basis factors


def _vec_expand(arr, vdim):
    """(E,Q,ndl,*rest) scalar-basis -> (E,Q,vdim*ndl,vdim,*rest) block layout."""
    E, Q, n = arr.shape[:3]
    rest = arr.shape[3:]
    out = jnp.zeros((E, Q, vdim, n, vdim) + rest, dtype=arr.dtype)
    for c in range(vdim):
        out = out.at[:, :, c, :, c].set(arr)
    return out.reshape(E, Q, vdim * n, vdim, *rest)


def proxy_factor(proxy: ProxyFunction, ctx: EvalCtx) -> Factor:
    pctx = ctx
    if proxy.other:
        if getattr(ctx, "other_ctx", None) is None:
            raise TypeError(".Other() used outside a facet integral")
        pctx = ctx.other_ctx
    sp = proxy.space
    from ..fem.space import VectorFESpace, CompressedFESpace

    base = sp
    if isinstance(base, CompressedFESpace):
        et, order = base.mesh.et, base.order
        vdim = 1
    elif isinstance(base, VectorFESpace):
        et, order = base.mesh.et, base.order
        vdim = base.vdim
    else:
        et, order = base.mesh.et, base.order
        vdim = 1

    # XFESpace hooks (sign-masked enrichment) plug in via space attribute
    xhook = getattr(sp, "proxy_factor_hook", None)
    if xhook is not None:
        return xhook(proxy, ctx, pctx)

    if proxy.op == "val":
        B = shapes(et, order, pctx.ref_pts)
        arr = B if vdim == 1 else _vec_expand(B, vdim)
    elif proxy.op == "grad":
        G = dshapes(et, order, pctx.ref_pts)  # (E,Q,ndl,d)
        Gp = jnp.einsum("eqid,eqdg->eqig", G, pctx.Jinv)
        arr = Gp if vdim == 1 else _vec_expand(Gp, vdim)
    elif proxy.op == "div":
        if vdim != base.mesh.dim:
            raise TypeError("div needs a vector space with vdim == mesh.dim")
        G = dshapes(et, order, pctx.ref_pts)
        Gp = jnp.einsum("eqid,eqdg->eqig", G, pctx.Jinv)
        full = _vec_expand(Gp, vdim)  # (E,Q,vd*ndl,vd,d)
        arr = jnp.einsum("eqndd->eqn", full)
    elif proxy.op == "dnk":
        arr = _dnk_factor(et, order, proxy.op_args[0], pctx)
        if vdim != 1:
            arr = _vec_expand(arr, vdim)
    else:
        raise NotImplementedError(f"proxy op {proxy.op}")
    return Factor(block=proxy.block_key, arr=arr, space=sp)


def _dnk_factor(et, order, k, ctx: EvalCtx):
    """Exact k-th directional derivative of all shapes along the facet normal.

    Replaces the reference's central-FD stencils (xfem/ghostpenalty.cpp:8-130):
    the basis restricted to the line x + t*n is a 1D polynomial of degree
    <= order, so sampling at order+1 Chebyshev nodes and differentiating the
    interpolant is exact.
    """
    p = order
    n = ctx.normal  # (E,Q,d) physical unit normal
    dir_ref = jnp.einsum("eqdg,eqg->eqd", ctx.Jinv, n)  # chain rule direction
    # 1D nodes and k-th derivative weights at t=0
    tn = np.cos(np.pi * (2 * np.arange(p + 1) + 1) / (2 * (p + 1)))  # Chebyshev
    V = np.vander(tn, increasing=True)  # V[i,j] = t_i^j
    Vinv = np.linalg.inv(V)
    wk = factorial(k) * Vinv[k]  # (p+1,)
    # |dir_ref| ~ 1/h: sample along the UNIT reference direction so the
    # nodes stay O(1) inside the element (raw t*dir_ref puts them O(1/h)
    # outside, where degree-p values grow like h^-p and the Vandermonde
    # differentiation cancels catastrophically — h^(k-p)*eps relative
    # error, fatal in f32); rescale the derivative by |dir_ref|^k after
    dnrm = jnp.linalg.norm(dir_ref, axis=-1, keepdims=True)  # (E,Q,1)
    step = dir_ref / jnp.maximum(dnrm, 1e-30)
    pts = ctx.ref_pts[:, :, None, :] + tn[None, None, :, None] * step[:, :, None, :]
    S = shapes(et, order, pts)  # (E,Q,p+1,ndl)
    wk = jnp.asarray(wk, dtype=S.dtype)
    return jnp.einsum("t,eqti->eqi", wk, S) * dnrm**k


# ---------------------------------------------------------------------------
# the evaluator


def eval_form(cf, ctx: EvalCtx):
    """CF graph -> list of bilinear-jet Terms."""
    if not cf.has_proxy:
        v = eval_pure(cf, ctx)
        if cf.dims == ():
            return [Term(scalar=_bc(v, ctx))]
        return [Term(scalar=jnp.ones((), dtype=ctx.ref_pts.dtype),
                     cfree=_full(v, ctx, cf.dims))]

    if isinstance(cf, ProxyFunction):
        fac = proxy_factor(cf, ctx)
        t = Term(scalar=jnp.ones((), dtype=ctx.ref_pts.dtype))
        if cf.test:
            t = replace(t, vfac=fac)
        else:
            t = replace(t, ufac=fac)
        return [t]

    if isinstance(cf, C.Add):
        return eval_form(cf.a, ctx) + eval_form(cf.b, ctx)
    if isinstance(cf, C.Scale):
        return [replace(t, scalar=cf.s * t.scalar) for t in eval_form(cf.a, ctx)]
    if isinstance(cf, C.Mul):
        return _prod(cf.a, cf.b, ctx, 0)
    if isinstance(cf, C.InnerProduct):
        return _prod(cf.a, cf.b, ctx, len(cf.a.dims))
    if isinstance(cf, C.MatVec):
        return _prod(cf.a, cf.b, ctx, 1)
    if isinstance(cf, C.Div):
        if cf.b.has_proxy:
            raise TypeError("division by a proxy expression")
        inv = 1.0 / _bc(eval_pure(cf.b, ctx), ctx)
        return [replace(t, scalar=t.scalar * inv) for t in eval_form(cf.a, ctx)]
    if isinstance(cf, C.Component):
        terms = eval_form(cf.a, ctx)
        return [_component(t, cf.idx) for t in terms]

    raise NotImplementedError(
        f"proxy expression through {type(cf).__name__} is not supported"
    )


def _prod(a, b, ctx, c):
    ta, tb = eval_form(a, ctx), eval_form(b, ctx)
    return [term_mul(t1, t2, c) for t1 in ta for t2 in tb]


def _component(t: Term, idx: int) -> Term:
    """Index the leading free component dim of a term."""
    loc = t.comp_loc()
    if loc == "c":
        c = t.cfree[:, :, idx]
        if c.ndim == 2:  # became scalar
            return replace(t, cfree=None, scalar=t.scalar * c)
        return replace(t, cfree=c)
    if loc == "u":
        return replace(t, ufac=replace(t.ufac, arr=t.ufac.arr[:, :, :, idx]))
    if loc == "v":
        return replace(t, vfac=replace(t.vfac, arr=t.vfac.arr[:, :, :, idx]))
    raise TypeError("component of scalar term")
