"""Batched straight-cut quadrature rule construction.

TPU-native replacement for the reference cut engine
(``cutint/straightcutrule.cpp:580-661`` StraightCutIntegrationRule and the
simplex/box cutters): instead of per-element recursion and virtual dispatch,
*all* elements are processed at once by fixed-shape tensor ops:

  1. epsilon-guard level-set vertex values (ref. straightcutrule.cpp:548-556),
  2. compute a sign-pattern id per (sub-)simplex,
  3. gather precomputed decomposition tables (cuttables.py),
  4. interpolate edge cut points, map reference Gauss rules into every
     sub-simplex, and emit padded quadrature tensors with side tags.

Tensor-product elements (QUAD/HEX) are decomposed into 2/6 simplices first —
the route of the reference's fallback policy
(``cutint/straightcutrule.cpp:475-491`` GetFallbackIntegrationRule).  An exact
tensor-product rule for genuinely multilinear cuts is a planned refinement.

All weights are *reference-element* weights:
  - volume weights integrate to the sub-domain measure in reference coords;
    multiply by |det J(x)| pointwise for physical integrals,
  - interface weights integrate to the reference (d-1)-measure; multiply by
    ||J^-T n_ref|| * |det J| pointwise (co-area scaling, the batched analog of
    ``TransformQuadUntrafoToIRInterface``, straightcutrule.cpp:558-576).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import config
from .cuttables import simplex_cut_tables, ET_SPLIT, REF_VERTS, NSUB, NIF
from .gauss import reference_rule, SIMPLEX_OF_DIM, ET_DIM


class CutRule(NamedTuple):
    """Padded quadrature tensors for a batch of elements (reference coords).

    Volume part: points `pts` (E,Q,d), weights `w` (E,Q) (zero-padded), side
    tag `side` (E,Q) in {0=NEG,1=POS}.  Interface part: `pts_if` (E,QI,d),
    `w_if` (E,QI), unit reference normal `nref` (E,QI,d) (NEG->POS).
    """

    pts: jax.Array
    w: jax.Array
    side: jax.Array
    pts_if: jax.Array
    w_if: jax.Array
    nref: jax.Array


def eps_guard(vals, eps=None):
    """Snap near-zero level-set values to +eps, exactly like the reference
    (straightcutrule.cpp:553-554, spacetimecutrule.cpp:132: every
    ``|v| < 1e-14`` becomes ``+1e-14`` REGARDLESS of sign).

    The collapse to the positive side is deliberate: a vertex that is
    numerically zero (exactly on the interface, possibly with a rounding
    residue of either sign) gets one deterministic side, so rounding noise
    cannot fabricate sliver cut elements or O(1) cut-facet contributions on
    facets that lie ON the interface (a relative per-element threshold was
    tried and measurably degraded a DG scheme exactly there).  The
    threshold is ABSOLUTE like the reference's; for level sets scaled far
    from O(1), adjust ``config.lset_eps``."""
    if eps is None:
        eps = config.lset_eps
    return jnp.where(jnp.abs(vals) < eps,
                     jnp.asarray(eps, dtype=vals.dtype), vals)


def eps_guard_list(vals_list, eps=None):
    """``eps_guard`` for SoA corner arrays (one (E,) array per corner)."""
    return [eps_guard(v, eps=eps) for v in vals_list]


def _gram_measure(edges):
    """k-volume scale factor of a simplex spanned by edge matrix (..., k, g).

    Equals |det| for k==g; sqrt(det(E E^T)) generally. Returns the *scale*
    relative to the unit simplex rule (whose weights already sum to 1/k!).
    """
    k = edges.shape[-2]
    g = edges.shape[-1]
    if k == g:
        if k == 1:
            return jnp.abs(edges[..., 0, 0])
        if k == 2:
            return jnp.abs(
                edges[..., 0, 0] * edges[..., 1, 1] - edges[..., 0, 1] * edges[..., 1, 0]
            )
        if k == 3:
            e = edges
            det = (
                e[..., 0, 0] * (e[..., 1, 1] * e[..., 2, 2] - e[..., 1, 2] * e[..., 2, 1])
                - e[..., 0, 1] * (e[..., 1, 0] * e[..., 2, 2] - e[..., 1, 2] * e[..., 2, 0])
                + e[..., 0, 2] * (e[..., 1, 0] * e[..., 2, 1] - e[..., 1, 1] * e[..., 2, 0])
            )
            return jnp.abs(det)
    G = jnp.einsum("...kg,...lg->...kl", edges, edges)
    if k == 1:
        det = G[..., 0, 0]
    elif k == 2:
        det = G[..., 0, 0] * G[..., 1, 1] - G[..., 0, 1] * G[..., 1, 0]
    else:
        det = jnp.linalg.det(G)
    # sqrt'(0) = inf: degenerate (padded) sub-simplices must keep a ZERO
    # gradient, not a NaN one, so guard the argument before the sqrt
    # (d/dphi of masked-out rules is 0 * inf = NaN otherwise; the pipeline
    # is advertised as differentiable through the level set)
    pos = det > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, det, 1.0)), 0.0)


def _solve_gradient(edges, dvals):
    """Solve edges @ g = dvals for the P1 gradient on each simplex.

    edges (..., d, d) rows = V_k - V_0; dvals (..., d). Guarded against
    singular (degenerate) simplices: returns zeros there.
    """
    d = edges.shape[-1]
    if d == 1:
        det = edges[..., 0, 0]
        g = dvals[..., 0] / jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
        return g[..., None]
    if d == 2:
        a, b = edges[..., 0, 0], edges[..., 0, 1]
        c, dd = edges[..., 1, 0], edges[..., 1, 1]
        det = a * dd - b * c
        det = jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
        g0 = (dvals[..., 0] * dd - dvals[..., 1] * b) / det
        g1 = (dvals[..., 1] * a - dvals[..., 0] * c) / det
        return jnp.stack([g0, g1], axis=-1)
    # d == 3: Cramer's rule
    e = edges
    det = (
        e[..., 0, 0] * (e[..., 1, 1] * e[..., 2, 2] - e[..., 1, 2] * e[..., 2, 1])
        - e[..., 0, 1] * (e[..., 1, 0] * e[..., 2, 2] - e[..., 1, 2] * e[..., 2, 0])
        + e[..., 0, 2] * (e[..., 1, 0] * e[..., 2, 1] - e[..., 1, 1] * e[..., 2, 0])
    )
    det = jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
    cols = []
    for j in range(3):
        mj = jnp.concatenate(
            [e[..., :, :j], dvals[..., :, None], e[..., :, j + 1:]], axis=-1
        )
        dj = (
            mj[..., 0, 0] * (mj[..., 1, 1] * mj[..., 2, 2] - mj[..., 1, 2] * mj[..., 2, 1])
            - mj[..., 0, 1] * (mj[..., 1, 0] * mj[..., 2, 2] - mj[..., 1, 2] * mj[..., 2, 0])
            + mj[..., 0, 2] * (mj[..., 1, 0] * mj[..., 2, 1] - mj[..., 1, 1] * mj[..., 2, 0])
        )
        cols.append(dj / det)
    return jnp.stack(cols, axis=-1)


def cut_rule_simplices(coords, vals, d: int, order: int):
    """Build cut rules for a batch of d-simplices.

    coords (M, d+1, d): simplex vertex coordinates (in element-reference space),
    vals (M, d+1): level-set values at those vertices (already eps-guarded).
    Returns a CutRule with per-simplex padded tensors.
    """
    M = coords.shape[0]
    nv = d + 1
    tabs = simplex_cut_tables(d)
    vtab = jnp.asarray(tabs["vtab"].astype(np.int32))
    stab = jnp.asarray(tabs["stab"].astype(np.int32))
    itab = jnp.asarray(tabs["itab"].astype(np.int32))
    imask = jnp.asarray(tabs["imask"].astype(np.int32))

    dtype = coords.dtype
    # reference rules (host constants)
    rp, rw = reference_rule(SIMPLEX_OF_DIM[d], order)
    rp = jnp.asarray(rp, dtype=dtype)  # (nq, d)
    rw = jnp.asarray(rw, dtype=dtype)  # (nq,)
    if d - 1 >= 1:
        ip, iw = reference_rule(SIMPLEX_OF_DIM[d - 1], order)
    else:  # point rule for 1D interfaces
        ip, iw = np.zeros((1, 0)), np.ones((1,))
    ip = jnp.asarray(ip, dtype=dtype)  # (nqi, d-1)
    iw = jnp.asarray(iw, dtype=dtype)

    nq, nqi = rw.shape[0], iw.shape[0]
    nsub, nif = NSUB[d], NIF[d]

    # 1. sign pattern per simplex
    pos = (vals > 0).astype(jnp.int32)  # (M, nv)
    powers = jnp.asarray([1 << i for i in range(nv)], dtype=jnp.int32)
    pattern = jnp.sum(pos * powers, axis=-1)  # (M,)

    # 2. all candidate points: P[a,b] = cut point of edge (a,b); P[a,a] = V_a
    #    t = phi_a / (phi_a - phi_b), guarded
    den = vals[:, :, None] - vals[:, None, :]  # (M, nv, nv)
    den = jnp.where(jnp.abs(den) < 1e-30, 1.0, den)
    t = vals[:, :, None] / den  # (M, nv, nv)
    t = jnp.clip(t, 0.0, 1.0)
    P = (1.0 - t[..., None]) * coords[:, :, None, :] + t[..., None] * coords[:, None, :, :]
    eye = jnp.eye(nv, dtype=dtype)[None, :, :, None]
    P = P * (1 - eye) + coords[:, :, None, :] * eye  # ensure exact diag
    Pflat = P.reshape(M, nv * nv, d)

    # 3. gather decomposition
    vt = vtab[pattern]  # (M, nsub, nv, 2)
    vidx = vt[..., 0] * nv + vt[..., 1]  # (M, nsub, nv)
    # one batched gather, no (M, nsub, nv*nv, d) repeat temporary
    sub = Pflat[jnp.arange(M)[:, None, None], vidx]  # (M, nsub, nv, d)
    side = stab[pattern]  # (M, nsub)

    # 4. volume rule on each sub-simplex
    v0 = sub[:, :, 0:1, :]  # (M,nsub,1,d)
    E = sub[:, :, 1:, :] - v0  # (M,nsub,d,d)
    scale = _gram_measure(E)  # (M,nsub)
    pts = v0 + jnp.einsum("qk,mskg->msqg", rp, E)  # (M,nsub,nq,d)
    w = scale[:, :, None] * rw[None, None, :]  # (M,nsub,nq)

    # snap padded/degenerate points to the simplex centroid so downstream
    # coefficient evaluation never sees duplicated corner points (guards
    # against 0 * singular-value = NaN)
    centroid = jnp.mean(coords, axis=1)  # (M,d)
    good = w > 0
    pts = jnp.where(good[..., None], pts, centroid[:, None, None, :])

    pts = pts.reshape(M, nsub * nq, d)
    w = w.reshape(M, nsub * nq)
    sidep = jnp.broadcast_to(side[:, :, None], (M, nsub, nq)).reshape(M, nsub * nq)

    # 5. interface rule
    it = itab[pattern]  # (M, nif, d, 2)
    iidx = it[..., 0] * nv + it[..., 1]  # (M, nif, d)
    isub = jnp.take_along_axis(
        Pflat[:, None, :, :].repeat(nif, axis=1), iidx[..., None].repeat(d, -1), axis=2
    )  # (M, nif, d, d)
    imk = imask[pattern].astype(dtype)  # (M, nif)
    iv0 = isub[:, :, 0:1, :]
    iE = isub[:, :, 1:, :] - iv0  # (M,nif,d-1,d)
    iscale = _gram_measure(iE) if d > 1 else jnp.ones_like(imk)
    pts_if = iv0 + (
        jnp.einsum("qk,mskg->msqg", ip, iE) if d > 1 else jnp.zeros((M, nif, nqi, d), dtype)
    )
    w_if = (iscale * imk)[:, :, None] * iw[None, None, :]
    goodi = w_if > 0
    pts_if = jnp.where(goodi[..., None], pts_if, centroid[:, None, None, :])
    pts_if = pts_if.reshape(M, nif * nqi, d)
    w_if = w_if.reshape(M, nif * nqi)

    # 6. reference normal from the P1 gradient on the simplex (NEG -> POS)
    Eel = coords[:, 1:, :] - coords[:, 0:1, :]  # (M,d,d)
    dv = vals[:, 1:] - vals[:, 0:1]  # (M,d)
    g = _solve_gradient(Eel, dv)  # (M,d)
    gn = jnp.linalg.norm(g, axis=-1, keepdims=True)
    nref = g / jnp.where(gn < 1e-30, 1.0, gn)
    nref = jnp.broadcast_to(nref[:, None, :], (M, nif * nqi, d))

    return CutRule(pts, w, sidep, pts_if, w_if, nref)


@partial(jax.jit, static_argnames=("et", "order", "policy"))
def cut_rule_element(et: str, elem_vals, order: int, policy: str = "OPTIMAL"):
    """Cut rule for a batch of elements of type `et` in *element-reference*
    coordinates.

    elem_vals (E, nvel): level-set values at element vertices.
    QUAD/HEX get the genuine multilinear iterated-integral rule
    (ops/multilinear.py) under `policy` in {"FIRST", "OPTIMAL", "FALLBACK"}
    (reference SWAP_DIMENSIONS_POLICY); simplices ignore the policy.
    """
    d = ET_DIM[et]
    E = elem_vals.shape[0]
    if et in ("quad", "hex"):
        from .multilinear import quad_cut_rule, hex_cut_rule

        vals = eps_guard(elem_vals)
        fn = quad_cut_rule if et == "quad" else hex_cut_rule
        return fn(vals, order, policy)

    split = ET_SPLIT[et]  # (nsplit, d+1)
    nsplit = split.shape[0]
    refv = jnp.asarray(REF_VERTS[et], dtype=elem_vals.dtype)  # (nvel, d)

    vals = eps_guard(elem_vals)
    scoords = refv[jnp.asarray(split)]  # (nsplit, d+1, d)
    coords = jnp.broadcast_to(scoords[None], (E, nsplit, d + 1, d)).reshape(
        E * nsplit, d + 1, d
    )
    svals = vals[:, jnp.asarray(split)].reshape(E * nsplit, d + 1)

    r = cut_rule_simplices(coords, svals, d, order)
    merge = lambda a: a.reshape(E, nsplit * a.shape[1], *a.shape[2:])
    return CutRule(*(merge(a) for a in r))
