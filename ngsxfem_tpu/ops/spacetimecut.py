"""Space-time cut quadrature rules.

Re-design of the reference space-time rule
(``cutint/spacetimecutrule.cpp:97-196``): the level set on a tensor-product
space-time element is a matrix of (time-node x space-vertex) values; the
spatial sign pattern changes only when a *vertex* time-polynomial crosses
zero, so the time axis is sliced at those roots (closed-form for k_t <= 2,
fixed-iteration bisection above, ref. root_finding :6-95), a Gauss rule is
placed on each slice, and the spatial straight-cut rule is built at every
time point — all as fixed-shape batched tensors.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .gauss import gauss_legendre_01, ET_DIM
from .straightcut import cut_rule_element, eps_guard


class SpaceTimeCutRule(NamedTuple):
    """Padded space-time quadrature tensors (element-reference coords + time).

    Volume: pts (E,Q,d), times (E,Q), w (E,Q), side (E,Q).
    Lateral interface: pts_if (E,QI,d), times_if (E,QI), w_if (E,QI)
    (reference weights; physical scaling as in CutRule, measured as
    dt x spatial interface measure), nref (E,QI,d).
    """

    pts: jax.Array
    times: jax.Array
    w: jax.Array
    side: jax.Array
    pts_if: jax.Array
    times_if: jax.Array
    w_if: jax.Array
    nref: jax.Array


def _poly_roots_in_01(coefs, kt: int, nbisect: int = 40):
    """Roots of per-vertex time polynomials inside (0,1).

    coefs (..., kt+1) monomial coefficients (c0 + c1 t + ...).  Returns
    (..., R) candidate roots clamped to [0,1] (invalid slots -> 0, harmless
    as slice boundaries).  Closed form for kt <= 2 (R = kt); for kt >= 3,
    subdivision into 2*kt subintervals + bisection per sign change (R = 2*kt),
    the granularity of the reference's root_finding
    (cutint/spacetimecutrule.cpp:6-95).
    """
    if kt == 0:
        return jnp.zeros(coefs.shape[:-1] + (1,), coefs.dtype)
    if kt == 1:
        a, b = coefs[..., 0], coefs[..., 1]
        t = -a / jnp.where(jnp.abs(b) < 1e-30, 1.0, b)
        return jnp.clip(t, 0.0, 1.0)[..., None]
    if kt == 2:
        c, b, a = coefs[..., 0], coefs[..., 1], coefs[..., 2]
        # a t^2 + b t + c = 0
        lin = -c / jnp.where(jnp.abs(b) < 1e-30, 1.0, b)  # fallback for a ~ 0
        disc = b * b - 4 * a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        den = 2 * jnp.where(jnp.abs(a) < 1e-30, 1.0, a)
        t1 = (-b - sq) / den
        t2 = (-b + sq) / den
        small_a = jnp.abs(a) < 1e-12
        no_root = disc < 0
        t1 = jnp.where(small_a, lin, jnp.where(no_root, 0.0, t1))
        t2 = jnp.where(small_a, 0.0, jnp.where(no_root, 0.0, t2))
        return jnp.stack([jnp.clip(t1, 0, 1), jnp.clip(t2, 0, 1)], axis=-1)

    # kt >= 3: subdivision + per-subinterval bisection (the granularity of
    # the reference's root_finding, cutint/spacetimecutrule.cpp:6-95).  A
    # degree-kt polynomial has <= kt roots in (0,1); 2*kt equal subintervals
    # separate them in practice, and every sign-changing subinterval is
    # bisected to convergence — all in fixed shapes.
    nsub = 2 * kt

    def peval(t):
        out = jnp.zeros(t.shape, coefs.dtype)
        for j in range(kt, -1, -1):
            out = out * t + coefs[..., None, j]
        return out

    edges = jnp.linspace(0.0, 1.0, nsub + 1, dtype=coefs.dtype)
    lo = jnp.broadcast_to(edges[:-1], coefs.shape[:-1] + (nsub,))
    hi = jnp.broadcast_to(edges[1:], coefs.shape[:-1] + (nsub,))
    flo = peval(lo)
    fhi = peval(hi)
    has = (flo * fhi) < 0  # (..., nsub)

    def body(_, lohif):
        lo, hi, flo = lohif
        mid = 0.5 * (lo + hi)
        fm = peval(mid)
        go_left = (flo * fm) < 0
        lo2 = jnp.where(go_left, lo, mid)
        hi2 = jnp.where(go_left, mid, hi)
        flo2 = jnp.where(go_left, flo, fm)
        return lo2, hi2, flo2

    lo, hi, flo = jax.lax.fori_loop(0, nbisect, body, (lo, hi, flo))
    root = 0.5 * (lo + hi)
    return jnp.where(has, root, 0.0)  # (..., nsub) candidates


def spacetime_cut_rule(et: str, vals_st, kt: int, order_space: int,
                       order_time: int, policy: str = "OPTIMAL"):
    """Space-time cut rule for a batch of elements.

    vals_st (E, nd_t, nvel): level-set values at (time-node, space-vertex);
    kt = time order of the level set.  Returns a SpaceTimeCutRule.
    The spatial rule at each time point is `cut_rule_element` — the SAME
    dispatch as the stationary integrator (simplex tables; genuine
    multilinear iterated-integral rules for QUAD/HEX under `policy`), so
    stationary and space-time integrals agree on identical vertex values.
    """
    from ..spacetime.timefe import _time_coeff

    E, ndt, nvel = vals_st.shape
    dtype = vals_st.dtype
    vals_st = eps_guard(vals_st)

    # vertex time polynomials in monomial form: coef (E, nvel, kt+1)
    C = jnp.asarray(_time_coeff(kt), dtype=dtype)  # (nm, nd_t) mono->nodal
    coefs = jnp.einsum("mt,etv->evm", C, vals_st)  # phi_v(t) = sum c_m t^m

    tpts, twts, vv = _st_slices(coefs, kt, order_time)
    E, T = tpts.shape

    # spatial cut rule at every (element, time) pair — one batched call into
    # the stationary dispatch (simplex split / multilinear QUAD-HEX rule)
    r = cut_rule_element(et, vv.reshape(E * T, nvel), order_space, policy)
    return _st_assemble(r, tpts, twts)


def spacetime_cut_rule_simplices(coords, vals_a, vals_b, d: int,
                                 order_space: int, order_time: int):
    """Space-time (k_t=1) cut rule on a batch of arbitrary d-simplices.

    The subdivision engine's space-time kernel (the TPU counterpart of the
    reference legacy engine's 4D prism handling,
    ``cutint/xintegration.cpp`` ``NumericalIntegrationStrategy<ET_SPACE,
    ET_TIME>``): ``coords (B, d+1, d)`` simplex vertices in element-reference
    space, ``vals_a``/``vals_b (B, d+1)`` level-set values at those vertices
    at the (sub-)slab's local t=0 / t=1.  The spatial rule per time point is
    ``cut_rule_simplices``, so weights carry the sub-simplex measure and
    interface normals live in the same coordinate frame as ``coords``."""
    from .straightcut import cut_rule_simplices

    B, nv = vals_a.shape
    vals_a = eps_guard(vals_a)
    vals_b = eps_guard(vals_b)
    coefs = jnp.stack([vals_a, vals_b - vals_a], axis=-1)  # (B, nv, 2)

    tpts, twts, vv = _st_slices(coefs, 1, order_time)
    T = tpts.shape[1]

    coords_rep = jnp.broadcast_to(
        coords[:, None], (B, T) + coords.shape[1:]).reshape(
        B * T, *coords.shape[1:])
    r = cut_rule_simplices(coords_rep, vv.reshape(B * T, nv), d, order_space)
    return _st_assemble(r, tpts, twts)


def _st_slices(coefs, kt: int, order_time: int):
    """Slice [0,1] at the vertex-polynomial roots and place a Gauss rule on
    each slice.  coefs (E, nvel, kt+1) monomial time polynomials per vertex.
    Returns (tpts (E,T), twts (E,T), vv (E,T,nvel) spatial vertex values at
    each time point)."""
    E = coefs.shape[0]
    dtype = coefs.dtype
    roots = _poly_roots_in_01(coefs, kt).reshape(E, -1)  # (E, nvel*kt')
    K = roots.shape[1]
    # slice boundaries: sorted {0, roots..., 1}
    bnds = jnp.sort(
        jnp.concatenate(
            [jnp.zeros((E, 1), dtype), roots, jnp.ones((E, 1), dtype)], axis=1
        ),
        axis=1,
    )  # (E, K+2)
    t0 = bnds[:, :-1]  # (E, K+1) interval starts
    dt = bnds[:, 1:] - bnds[:, :-1]  # lengths (>= 0)

    tg, tw = gauss_legendre_01(max(1, (order_time + 2) // 2))
    tg = jnp.asarray(tg, dtype=dtype)
    tw = jnp.asarray(tw, dtype=dtype)
    nt = tg.shape[0]
    # all time points: (E, K+1, nt)
    tpts = t0[:, :, None] + dt[:, :, None] * tg[None, None, :]
    twts = dt[:, :, None] * tw[None, None, :]
    T = (K + 1) * nt
    tpts = tpts.reshape(E, T)
    twts = twts.reshape(E, T)

    # spatial vertex values at each time point: (E, T, nvel)
    tm = jnp.stack([tpts**j for j in range(kt + 1)], axis=-1)  # (E,T,nm)
    vv = jnp.einsum("etm,evm->etv", tm, coefs)
    return tpts, twts, vv


def _st_assemble(r, tpts, twts):
    """Fold the per-(element, time-point) spatial CutRule ``r`` into one
    SpaceTimeCutRule: time weights folded into the quadrature weights
    (iterated-integral convention: the 'IF' space-time integral is
    dt x spatial interface measure, like the reference's
    SpaceTimeCutIntegrationRule)."""
    E, T = tpts.shape

    def merge(a):
        # (E*T, q, ...) -> (E, T*q, ...)
        return a.reshape(E, T * a.shape[1], *a.shape[2:])

    def fold_time(w):
        q = w.shape[1]
        return (w.reshape(E, T, q) * twts[:, :, None]).reshape(E, -1)

    def time_of(qn):
        return jnp.broadcast_to(tpts[:, :, None], (E, T, qn)).reshape(E, -1)

    pts = merge(r.pts)
    w = fold_time(r.w)
    side = merge(r.side)
    times = time_of(r.pts.shape[1])
    pts_if = merge(r.pts_if)
    w_if = fold_time(r.w_if)
    times_if = time_of(r.pts_if.shape[1])
    nref = merge(r.nref)
    return SpaceTimeCutRule(pts, times, w, side, pts_if, times_if, w_if, nref)
