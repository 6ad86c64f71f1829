"""Jittable Krylov solvers (matrix-free friendly).

Replaces the reference's reliance on NGSolve sparse direct solvers/CG with
device-resident iterations: everything is lax.while_loop-based so whole
solves compile into one XLA program and shard transparently when the matvec
is a psum-reduced SPMD function (parallel/sharding.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _vdot(a, b):
    """Krylov inner product at FULL precision: on TPU a default-precision
    f32 dot runs through bf16 passes, which poisons alpha/beta and stalls
    CG far above tolerance (docs/PERFORMANCE.md f32-integrity notes)."""
    return jnp.vdot(a, b, precision=lax.Precision.HIGHEST)


def cg(matvec, b, x0=None, M=None, maxiter=500, tol=1e-10, unroll=1):
    """Preconditioned conjugate gradients; returns (x, iters, res_norm).

    `matvec`/`M` are functions on dof vectors (may contain psum collectives).
    With ``tol=0`` (fixed iteration budget) the loop runs as a
    ``lax.fori_loop`` with the given ``unroll`` factor — fewer loop-control
    boundaries for runtimes that charge per iteration (see
    docs/PERFORMANCE.md tunnel notes).
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if M is None:
        M = lambda r: r

    r0 = b - matvec(x0)
    z0 = M(r0)
    p0 = z0
    rz0 = _vdot(r0, z0)
    bnorm = jnp.sqrt(_vdot(b, b))
    atol2 = (tol * jnp.maximum(bnorm, 1e-30)) ** 2

    def cond(state):
        x, r, z, p, rz, k = state
        return (_vdot(r, r) > atol2) & (k < maxiter)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = matvec(p)
        denom = _vdot(p, Ap)
        alpha = rz / jnp.where(denom == 0, 1.0, denom)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = _vdot(r, z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    state0 = (x0, r0, z0, p0, rz0, 0)
    if tol == 0:
        x, r, z, p, rz, k = lax.fori_loop(
            0, maxiter, lambda _, s: body(s), state0,
            unroll=min(unroll, maxiter))
    else:
        x, r, z, p, rz, k = lax.while_loop(cond, body, state0)
    return x, k, jnp.sqrt(_vdot(r, r))


def minres(matvec, b, x0=None, M=None, maxiter=500, tol=1e-10):
    """Preconditioned MINRES (Paige-Saunders) for SYMMETRIC INDEFINITE
    systems; returns (x, iters, rel_res_estimate).

    The device-resident iterative counterpart of the host direct solves the
    reference uses for saddle-point systems (cut Stokes: the Nitsche
    velocity-pressure operator is symmetric but indefinite, so CG does not
    apply).  ``M`` must be symmetric positive definite (it defines the
    Lanczos inner product); the whole solve is one ``lax.while_loop`` XLA
    program and shards transparently when ``matvec`` carries psum
    collectives (as ``cg`` does).
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if M is None:
        M = lambda r: r

    eps = jnp.finfo(b.dtype).eps
    r1 = b - matvec(x0)
    y0 = M(r1)
    beta1 = jnp.sqrt(jnp.maximum(_vdot(r1, y0), 0.0))
    zerov = jnp.zeros_like(b)

    # state: (x, y, r1, r2, w, w2, oldb, beta, dbar, epsln, phibar,
    #         cs, sn, k)
    state0 = (x0, y0, r1, r1, zerov, zerov,
              jnp.asarray(0.0, b.dtype), beta1,
              jnp.asarray(0.0, b.dtype), jnp.asarray(0.0, b.dtype), beta1,
              jnp.asarray(-1.0, b.dtype), jnp.asarray(0.0, b.dtype), 0)
    rtol = tol * jnp.maximum(beta1, 1e-30)

    def cond(state):
        phibar, k = state[10], state[13]
        return (phibar > rtol) & (k < maxiter) & (beta1 > 0)

    def body(state):
        (x, y, r1, r2, w, w2, oldb, beta, dbar, epsln, phibar,
         cs, sn, k) = state
        s = 1.0 / jnp.where(beta == 0, 1.0, beta)
        v = s * y
        y = matvec(v)
        # three-term Lanczos: subtract the previous direction (skip at k=0)
        y = y - jnp.where(k > 0, beta / jnp.where(oldb == 0, 1.0, oldb),
                          0.0) * r1
        alfa = _vdot(v, y)
        y = y - (alfa / jnp.where(beta == 0, 1.0, beta)) * r2
        r1, r2 = r2, y
        y = M(r2)
        oldb = beta
        beta = jnp.sqrt(jnp.maximum(_vdot(r2, y), 0.0))
        # previous rotation applied to the new column of T
        oldeps = epsln
        delta = cs * dbar + sn * alfa
        gbar = sn * dbar - cs * alfa
        epsln = sn * beta
        dbar = -cs * beta
        gamma = jnp.maximum(jnp.sqrt(gbar * gbar + beta * beta), eps)
        cs = gbar / gamma
        sn = beta / gamma
        phi = cs * phibar
        phibar = sn * phibar
        # solution update
        w1 = w2
        w2 = w
        w = (v - oldeps * w1 - delta * w2) / gamma
        x = x + phi * w
        return (x, y, r1, r2, w, w2, oldb, beta, dbar, epsln, phibar,
                cs, sn, k + 1)

    out = lax.while_loop(cond, body, state0)
    x, phibar, k = out[0], out[10], out[13]
    return x, k, phibar / jnp.maximum(beta1, 1e-30)


def cg_ir(matvec32, matvec64, b, M=None, outer=4, inner=120):
    """Mixed-precision iterative refinement: f32 inner PCG, f64 outer
    residual.  The TPU-native way to a certified high-accuracy solve —
    native-speed f32 CG cannot push the TRUE residual below ~1e-3 relative
    on ill-conditioned cut systems (the recursion residual drifts from the
    true one), while full emulated-f64 CG is ~10x slower per iteration.
    Refinement needs only `outer` emulated-f64 matvecs: each outer step
    computes r = b - A x in f64, solves the correction system in f32 with
    `inner` fixed PCG iterations, and accumulates in f64.  Measured at
    nx=48 (117k dofs): true f64 relative residual 3.4e-13 in ~40 ms where
    plain f32 PCG stalls at 1.6e-3.

    `matvec32`/`matvec64` act on f32/f64 vectors; `M` is the f32
    preconditioner.  Returns (x (f64), res_norm (f64, TRUE residual)).
    Requires jax_enable_x64.
    """
    if M is None:
        M = lambda r: r
    b64 = b.astype(jnp.float64)
    x64 = jnp.zeros_like(b64)
    r64 = b64
    rn = jnp.linalg.norm(r64)
    # SAFEGUARDED refinement: the inner f32 CG on an ill-conditioned cut
    # system can diverge (overflow -> inf -> NaN cascade); a correction is
    # applied only if it REDUCES the true f64 residual, and non-finite
    # entries are zeroed first.  Same matvec64 count as the plain loop
    # (the candidate residual IS the next iteration's residual); the
    # returned residual is monotone non-increasing and finite whenever
    # (A, b) are.
    for _ in range(outer):
        scale = jnp.maximum(rn, 1e-30)
        r32 = (r64 / scale).astype(jnp.float32)
        d, _, _ = cg(matvec32, r32, M=M, maxiter=inner, tol=0.0)
        d64 = d.astype(jnp.float64)
        d64 = jnp.where(jnp.isfinite(d64), d64, 0.0)
        x_c = x64 + scale * d64
        r_c = b64 - matvec64(x_c)
        rn_c = jnp.linalg.norm(r_c)
        accept = rn_c < rn  # False on NaN: rejects a poisoned correction
        x64 = jnp.where(accept, x_c, x64)
        r64 = jnp.where(accept, r_c, r64)
        rn = jnp.where(accept, rn_c, rn)
    return x64, rn


def jacobi_preconditioner(diag, free_mask=None):
    inv = jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 0.0)
    if free_mask is not None:
        inv = jnp.where(free_mask, inv, 0.0)

    def M(r):
        return inv * r

    return M


def masked_matvec(matvec, free_mask):
    """Project a matvec onto the free dofs: A' = P A P + (I - P)."""

    def mv(x):
        xp = jnp.where(free_mask, x, 0.0)
        y = matvec(xp)
        return jnp.where(free_mask, y, x)

    return mv



class MinResSolver:
    """NGSolve-flavoured wrapper: ``MinResSolver(mat, pre) * rhs``.

    Iterative replacement for the host direct ``mat.Inverse(freedofs)`` the
    reference tutorials use on symmetric-indefinite saddle-point systems
    (cut Stokes, ``py_tutorials/stokesxfem.py:106``): the whole solve stays
    device-resident.  The default preconditioner is the SPD absolute-value
    Jacobi ``r / max(|diag|, eps)`` — plain Jacobi is indefinite here
    (pressure/multiplier rows carry negative or zero diagonals), which
    would break the MINRES Lanczos inner product.
    """

    def __init__(self, mat, pre=None, maxsteps=2000, tol=1e-10,
                 freedofs=None):
        self.mat = mat
        self.pre = pre
        self.maxsteps = maxsteps
        self.tol = tol
        self.freedofs = freedofs

    def __mul__(self, rhs):
        from ..fem.space import _arr

        b = jnp.asarray(rhs)
        mat = self.mat
        if hasattr(mat, "ell"):  # COO -> ELL: scatter-free SpMV on TPU
            mat = mat.ell()
        mv = mat.matvec if hasattr(mat, "matvec") else mat
        M = self.pre
        if M is None and hasattr(mat, "diagonal"):
            ad = jnp.abs(mat.diagonal())
            dinv = jnp.where(ad > 1e-30, 1.0 / jnp.maximum(ad, 1e-30), 1.0)
            if self.freedofs is not None:
                fm0 = jnp.asarray(_arr(self.freedofs))
                dinv = jnp.where(fm0, dinv, 1.0)  # identity on fixed dofs
            M = lambda r: dinv * r
        if self.freedofs is not None:
            fm = jnp.asarray(_arr(self.freedofs))
            mv = masked_matvec(mv, fm)
            b = jnp.where(fm, b, 0.0)
        x, k, res = minres(mv, b, M=M, maxiter=self.maxsteps, tol=self.tol)
        return x


@partial(jax.jit, static_argnames=("maxiter", "tol"))
def _cg_ell(vals, cols, b, free, maxiter, tol):
    """Jacobi-preconditioned CG on a free-dof-masked ELL operator, one XLA
    program with every array as an ARGUMENT (a closure-captured device array
    would be read back to host at lowering — see bench.py docstring)."""
    rid = jnp.arange(cols.shape[0])[:, None]
    diag = jnp.sum(jnp.where(cols == rid, vals, 0.0), axis=1)
    dinv = jnp.where(free & (jnp.abs(diag) > 1e-30), 1.0 / diag, 0.0)
    bm = jnp.where(free, b, 0.0)

    def mv(x):
        xp = jnp.where(free, x, 0.0)
        y = jnp.sum(vals * xp[cols], axis=1)
        return jnp.where(free, y, x)

    return cg(mv, bm, M=lambda r: dinv * r, maxiter=maxiter, tol=tol)


class CGSolver:
    """NGSolve-flavoured wrapper: `CGSolver(mat, pre) * rhs`."""

    def __init__(self, mat, pre=None, maxsteps=500, tol=1e-10, freedofs=None):
        self.mat = mat
        self.pre = pre
        self.maxsteps = maxsteps
        self.tol = tol
        self.freedofs = freedofs

    def __mul__(self, rhs):
        from ..fem.space import _arr
        from .sparse import ELLMatrix

        b = jnp.asarray(rhs)
        mat = self.mat
        if hasattr(mat, "ell"):  # COO -> ELL: scatter-free SpMV on TPU
            mat = mat.ell()
        if isinstance(mat, ELLMatrix) and self.pre is None:
            # fast path: cached all-args jit (Jacobi-CG on masked ELL)
            fm = (jnp.asarray(_arr(self.freedofs))
                  if self.freedofs is not None
                  else jnp.ones(mat.shape[0], dtype=bool))
            x, k, res = _cg_ell(mat.vals, mat.cols, b, fm,
                                self.maxsteps, self.tol)
            return x
        mv = mat.matvec if hasattr(mat, "matvec") else mat
        M = self.pre
        if self.freedofs is not None:
            fm = jnp.asarray(_arr(self.freedofs))
            mv = masked_matvec(mv, fm)
            b = jnp.where(fm, b, 0.0)
        if M is None and hasattr(mat, "diagonal"):
            M = jacobi_preconditioner(mat.diagonal())
        x, k, res = cg(mv, b, M=M, maxiter=self.maxsteps, tol=self.tol)
        return x
