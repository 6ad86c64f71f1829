"""Fused VMEM-resident Jacobi-PCG on the offset-diagonal (DIA) operator.

The TPU speed-of-light form of the flagship converged-solve loop
(reference analog: the CG solves driving every py_tutorial, e.g.
``py_tutorials/fictdom_ghostpen.py`` via NGSolve's CGSolver): one Pallas
kernel holds the SYMMETRIC operator's upper diagonals, the rhs, the Jacobi
inverse diagonal and all Krylov vectors in VMEM for the entire fixed
iteration budget, so the hot loop performs ZERO HBM traffic — the XLA DIA
path (solvers/sparse.dia_matvec inside krylov.cg) re-streams the full
diagonal table from HBM every iteration (~12.7 MB/iter at nx=48).

Key design points (docs/PERFORMANCE.md has the measured numbers):

* the dof vector is viewed as a (R, L) plane stack (L = one
  z-plane of the vertex lattice, n = R*L exactly); a flat index shift by a
  static offset o = q*L + rem becomes two static row/lane rotations and a
  lane-index select — pure VPU ops, no gathers;
* wrap-around garbage from the rotations is annihilated because a DIA
  diagonal is zero wherever its column leaves [0, n) — the same property
  `dia_matvec`'s zero padding relies on;
* symmetry halves the resident table: for o > 0 the transpose
  contribution y[j] += d_o[j-o] * x[j-o] is the same diagonal rolled the
  other way, so only the 14 upper diagonals (o >= 0) are loaded;
* dot products are full-array VPU f32 reductions (no MXU bf16 passes —
  the f32-integrity rules in docs/PERFORMANCE.md).

VMEM budget at nx=48 (n = 49^3 = 117,649; padded plane (56, 2432)):
14 diagonals ~7.6 MB + b/dinv/x/r/z/p carries ~3.8 MB + roll temporaries
~= 21 MB total — above the default ~16 MB scoped-VMEM limit, so the
pallas_call requests ``vmem_limit_bytes=100 MB`` (v5e cores physically
carry more than the default cap; Mosaic accepts the raise).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _upper(offsets):
    """Host split of a symmetric offset set into (main-diag idx, [(idx, o>0)])."""
    offs = [int(o) for o in np.asarray(offsets).tolist()]
    if sorted(offs) != sorted(-o for o in offs):
        raise ValueError("DIA offset set is not symmetric; fused CG "
                         "requires a symmetric operator")
    k0 = offs.index(0)
    pos = [(k, o) for k, o in enumerate(offs) if o > 0]
    return k0, pos


def _rollax(v, q, axis):
    """Static circular roll of a 2D value: out[i] = v[(i + q) mod size]."""
    q %= v.shape[axis]
    if q == 0:
        return v
    if axis == 0:
        return jnp.concatenate([v[q:], v[:q]], axis=0)
    return jnp.concatenate([v[:, q:], v[:, :q]], axis=1)


def _flat_roll(v, s, L):
    """out.flat[i] = v.flat[(i + s) mod n] for a (R, L) value, static s."""
    R = v.shape[0]
    q, rem = divmod(s, L)
    if rem == 0:
        return _rollax(v, q, 0)
    a = _rollax(_rollax(v, q, 0), rem, 1)
    b = _rollax(_rollax(v, q + 1, 0), rem, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    return jnp.where(col < L - rem, a, b)


def _sym_dia_matvec_2d(vals_up, p, k0_up, pos_up, L):
    """y = A p with A from upper diagonals; all operands (R, L) values.

    vals_up[k0_up] is the main diagonal; pos_up is [(row in vals_up, o>0)].
    """
    y = vals_up[k0_up] * p
    for k, o in pos_up:
        d = vals_up[k]
        y = y + d * _flat_roll(p, o, L)         # y[i] += d[i] * p[i+o]
        y = y + _flat_roll(d * p, -o, L)        # y[i+o] += d[i] * p[i]
    return y


def dia_cg_fused(offsets, vals, b, dinv, iters, plane, interpret=False):
    """Fixed-budget Jacobi-PCG, entirely inside one Pallas kernel.

    offsets : host ints, the symmetric DIA offset set (from
        ``UnfittedPoisson.dia_structure()["offsets"]``)
    vals    : (n_off, n) diagonal table (f32), assembled operator
    b       : (n,) rhs; dinv : (n,) Jacobi inverse diagonal
    iters   : static iteration count (matches ``krylov.cg(tol=0)``)
    plane   : static L with n == (n // L) * L (vertex-lattice plane size)

    Returns (x (n,), res_norm scalar) — same contract as the
    ``krylov.cg`` fixed-budget path up to f32 reduction-order roundoff.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = b.shape[0]
    L = int(plane)
    if n % L:
        raise ValueError(f"plane size {L} does not divide n={n}")
    R = n // L
    k0_full, pos_full = _upper(offsets)
    # compact to the upper rows only (halves the VMEM-resident table)
    rows = [k0_full] + [k for k, _ in pos_full]
    pos_up = [(i + 1, o) for i, (_, o) in enumerate(pos_full)]
    vals_up = vals[np.asarray(rows)].reshape(len(rows), R, L)
    b2 = b.reshape(R, L)
    dinv2 = dinv.reshape(R, L)
    dt = b.dtype

    def kernel(vals_ref, b_ref, dinv_ref, x_ref, res_ref):
        vu = [vals_ref[k] for k in range(len(rows))]
        bb = b_ref[:]
        di = dinv_ref[:]

        def matvec(p):
            return _sym_dia_matvec_2d(vu, p, 0, pos_up, L)

        def vdot(a, c):
            return jnp.sum(a * c)

        # x0 = 0 (as the bench pcg path): r0 = b
        r = bb
        z = di * r
        p = z
        rz = vdot(r, z)
        x = jnp.zeros_like(bb)

        def body(_, st):
            x, r, z, p, rz = st
            Ap = matvec(p)
            den = vdot(p, Ap)
            alpha = rz / jnp.where(den == 0, 1.0, den)
            x = x + alpha * p
            r = r - alpha * Ap
            z = di * r
            rz_new = vdot(r, z)
            beta = rz_new / jnp.where(rz == 0, 1.0, rz)
            p = z + beta * p
            return (x, r, z, p, rz_new)

        x, r, z, p, rz = jax.lax.fori_loop(0, iters, body,
                                           (x, r, z, p, rz))
        x_ref[:] = x
        res_ref[0, 0] = jnp.sqrt(vdot(r, r))

    # the default scoped-VMEM limit is ~16 MB; v5e cores physically carry
    # far more, and at nx=48 the diagonal table + Krylov carries + roll
    # temporaries need ~21 MB — raise the cap for this kernel only
    cls = getattr(pltpu, "CompilerParams", None) or \
        getattr(pltpu, "TPUCompilerParams", None)
    cparams = (cls(vmem_limit_bytes=100 * 1024 * 1024)
               if cls is not None else None)
    x2, res = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((R, L), dt),
                   jax.ShapeDtypeStruct((1, 1), dt)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        compiler_params=cparams,
        interpret=interpret,
    )(vals_up, b2, dinv2)
    return x2.reshape(n), res[0, 0]
