"""Sparse matrices as COO triplet tensors + solver front-ends.

Assembly emits concatenated COO triplets (the result of batched element-matrix
scatter); matvec is gather-multiply-segment_sum — the TPU-idiomatic sparse
kernel (SURVEY.md §7 assembly design).  ``Inverse`` mirrors NGSolve's
``a.mat.Inverse(freedofs)``: a host scipy-LU for robustness at test scale and
a device CG path for large SPD systems.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import config


class SparseMatrix:
    def __init__(self, rows, cols, vals, shape):
        self.rows = jnp.asarray(rows, dtype=jnp.int32)
        self.cols = jnp.asarray(cols, dtype=jnp.int32)
        self.vals = jnp.asarray(vals)
        self.shape = tuple(shape)

    # -- products ------------------------------------------------------------
    def matvec(self, x):
        x = _as_array(x)
        contrib = self.vals * x[self.cols]
        return jax.ops.segment_sum(contrib, self.rows, num_segments=self.shape[0])

    def __mul__(self, x):
        return self.matvec(x)

    def __matmul__(self, x):
        return self.matvec(x)

    def todense(self):
        A = jnp.zeros(self.shape, dtype=self.vals.dtype)
        return A.at[self.rows, self.cols].add(self.vals)

    def to_scipy(self):
        from scipy.sparse import coo_matrix

        return coo_matrix(
            (np.asarray(self.vals), (np.asarray(self.rows), np.asarray(self.cols))),
            shape=self.shape,
        ).tocsc()

    def diagonal(self):
        diag_mask = self.rows == self.cols
        return jax.ops.segment_sum(
            jnp.where(diag_mask, self.vals, 0.0), self.rows, num_segments=self.shape[0]
        )

    def to_ell(self):
        """Convert to padded ELL format (row-major gather layout).

        FEM rows have bounded nnz, so ELL wastes little; the matvec becomes
        gather+reduce with NO scatter — the TPU-friendly SpMV layout
        (segment_sum lowers to sort/scatter on TPU).
        """
        rows = np.asarray(self.rows)
        cols = np.asarray(self.cols)
        vals = np.asarray(self.vals)
        n = self.shape[0]
        # sum duplicate (row, col) entries via the native open-addressing
        # dedup (native/topology.cpp dedup_i64) — avoids sorting the full
        # triplet stream; only the unique set is ordered per row
        from ..mesh.native import unique_i64

        lin = rows.astype(np.int64) * self.shape[1] + cols
        uniq, inv = unique_i64(lin)
        nu = len(uniq)
        sums = np.bincount(inv, weights=vals, minlength=nu).astype(vals.dtype)
        urows = (uniq // self.shape[1]).astype(np.int32)
        ucols = (uniq % self.shape[1]).astype(np.int32)
        counts = np.bincount(urows, minlength=n)
        K = int(counts.max()) if len(counts) else 1
        ell_cols = np.zeros((n, K), dtype=np.int32)
        ell_vals = np.zeros((n, K), dtype=vals.dtype)
        # vectorized slot assignment: position within each row
        row_start = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=row_start[1:])
        order = np.argsort(urows, kind="stable")
        pos = np.empty(nu, dtype=np.int64)
        pos[order] = np.arange(nu) - row_start[urows[order]]
        ell_cols[urows, pos] = ucols
        ell_vals[urows, pos] = sums
        return ELLMatrix(jnp.asarray(ell_cols), jnp.asarray(ell_vals), self.shape)

    def ell(self):
        """Cached ELL view (8.5x faster matvec than segment-sum on TPU)."""
        if not hasattr(self, "_ell"):
            self._ell = self.to_ell()
        return self._ell

    def Inverse(self, freedofs=None, inverse="", **kw):
        return InverseMatrix(self, freedofs, method=inverse)

    def CreateTranspose(self):
        return SparseMatrix(self.cols, self.rows, self.vals, (self.shape[1], self.shape[0]))

    @property
    def T(self):
        return self.CreateTranspose()

    def __repr__(self):
        return f"SparseMatrix({self.shape}, nnz-triplets={self.vals.shape[0]})"


def _as_array(x):
    from ..fem.gridfunction import VecShim, StandaloneVec

    if isinstance(x, (VecShim, StandaloneVec)):
        return x.data
    return jnp.asarray(x)


class ELLMatrix:
    """Padded-row sparse matrix; matvec = gather + row reduce (no scatter).

    Optionally executes as a Pallas TPU kernel (row-tiled, VMEM-resident x)
    via `matvec_pallas`; the jnp path is the portable default.
    """

    def __init__(self, cols, vals, shape):
        self.cols = cols  # (n, K) int32
        self.vals = vals  # (n, K)
        self.shape = tuple(shape)

    def matvec(self, x):
        x = _as_array(x)
        return jnp.sum(self.vals * x[self.cols], axis=1)

    __mul__ = matvec
    __matmul__ = matvec

    def diagonal(self):
        n = self.shape[0]
        rid = jnp.arange(n)[:, None]
        return jnp.sum(jnp.where(self.cols == rid, self.vals, 0.0), axis=1)

    def matvec_pallas(self, x, block_rows=256):
        """Row-tiled Pallas SpMV: each grid step loads a (block, K) tile of
        cols/vals into VMEM, gathers x (kept whole in VMEM) and reduces.

        NOTE: current Mosaic (TPU v5e, jax 0.9) cannot lower the dynamic
        row gather this kernel needs (take_along_axis on mismatched block
        shapes asserts; the full-VMEM variant dies in the backend), so this
        falls back to the jnp gather path on failure.  The jnp path already
        runs at HBM bandwidth (~24 us for 36k x 25), so the kernel is an
        experiment, not the default."""
        try:
            return self._matvec_pallas_impl(x, block_rows)
        except Exception:
            return self.matvec(x)

    def _matvec_pallas_impl(self, x, block_rows=256):
        import jax
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        x = _as_array(x)
        n, K = self.cols.shape
        nb = -(-n // block_rows)
        npad = nb * block_rows
        cols = jnp.pad(self.cols, ((0, npad - n), (0, 0)))
        vals = jnp.pad(self.vals, ((0, npad - n), (0, 0)))
        # TPU Mosaic supports take_along_axis on 2D operands: broadcast x to
        # (n, K) once (VMEM-resident; a few MB for FEM-sized K)
        xK = jnp.broadcast_to(x[:, None], (x.shape[0], K))

        def kernel(cols_ref, vals_ref, x_ref, out_ref):
            c = cols_ref[:]
            v = vals_ref[:]
            g = jnp.take_along_axis(x_ref[:], c, axis=0)
            out_ref[:, 0] = jnp.sum(v * g, axis=1)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((npad, 1), x.dtype),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((block_rows, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_rows, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((xK.shape[0], K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(cols, vals, xK)
        return out[:n, 0]


def dia_matvec(offsets, vals, x):
    """Offset-diagonal (DIA) SpMV: y[r] = sum_k vals[k, r] * x[r + o_k].

    `offsets` are HOST ints (static); each diagonal contributes one static
    shifted slice of x and an elementwise FMA — no gather instructions at
    all.  On TPU this is the speed-of-light format for stencil operators
    (structured meshes): the ELL gather path serializes scalar loads
    (~24.5 ms for n=117k, K=28), the DIA path streams (n,) vectors at HBM
    bandwidth.  Entries off the right/left end of a diagonal read zero
    padding, so boundary rows need no masking.
    """
    offs = [int(o) for o in np.asarray(offsets).tolist()]
    n = x.shape[0]
    mneg = max(-min(offs), 0)
    mpos = max(max(offs), 0)
    xp = jnp.pad(x, (mneg, mpos))
    y = None
    for k, o in enumerate(offs):
        t = vals[k] * jax.lax.dynamic_slice_in_dim(xp, mneg + o, n)
        y = t if y is None else y + t
    return y


class DIAMatrix:
    """Offset-diagonal sparse matrix for stencil-structured operators.

    vals (n_off, n): diagonal k holds A[r, r + offsets[k]] at position r
    (absent entries zero).  Built by ``UnfittedPoisson.dia_structure`` for
    structured meshes; see `dia_matvec` for why this is the TPU-native
    format.
    """

    def __init__(self, offsets, vals):
        self.offsets = np.asarray(offsets)
        self.vals = vals
        n = vals.shape[1]
        self.shape = (n, n)

    def matvec(self, x):
        return dia_matvec(self.offsets, self.vals, _as_array(x))

    __mul__ = matvec
    __matmul__ = matvec

    def diagonal(self):
        k0 = np.flatnonzero(np.asarray(self.offsets) == 0)
        if k0.size != 1:
            raise ValueError("DIAMatrix has no offset-0 diagonal")
        return self.vals[int(k0[0])]


class InverseMatrix:
    """Solver object: `inv * rhs` solves on the free dofs (zero elsewhere).

    method: NGSolve direct-solver names ("", "sparsecholesky", "umfpack",
    "pardiso", "masterinverse") all dispatch to the host scipy LU;
    "cg" runs the device Jacobi-CG path (solvers/krylov) for large SPD
    systems.  Unknown names raise instead of being silently ignored.
    """

    _DIRECT = ("", "sparsecholesky", "umfpack", "pardiso", "masterinverse")

    def __init__(self, mat: SparseMatrix, freedofs=None, method=""):
        if mat.shape[0] != mat.shape[1]:
            raise ValueError(
                f"Inverse of a rectangular matrix {mat.shape}; "
                "Petrov-Galerkin systems must be square to solve")
        self.mat = mat
        self.method = str(method or "").lower()
        if self.method not in self._DIRECT + ("cg",):
            raise ValueError(
                f"unknown inverse method {method!r}; use one of "
                f"{self._DIRECT + ('cg',)}")
        n = mat.shape[0]
        if freedofs is None:
            self.free = np.ones(n, dtype=bool)
        else:
            from ..fem.space import _arr

            self.free = _arr(freedofs)
        self._factor = None

    def _factorize(self):
        if self._factor is None:
            from scipy.sparse.linalg import splu

            A = self.mat.to_scipy().tocsr()
            idx = np.nonzero(self.free)[0]
            Af = A[idx][:, idx].tocsc()
            self._factor = (splu(Af), idx)
        return self._factor

    def solve(self, rhs):
        if self.method == "cg":  # device path, no host round trip
            from .krylov import CGSolver

            return CGSolver(self.mat, freedofs=None if self.free.all()
                            else self.free, maxsteps=20 * self.mat.shape[0],
                            tol=1e-12) * _as_array(rhs)
        rhs = np.asarray(_as_array(rhs), dtype=np.float64)
        lu, idx = self._factorize()
        out = np.zeros_like(rhs)
        out[idx] = lu.solve(rhs[idx])
        return jnp.asarray(out, dtype=config.dtype)

    def __mul__(self, rhs):
        return self.solve(rhs)

    def __matmul__(self, rhs):
        return self.solve(rhs)
