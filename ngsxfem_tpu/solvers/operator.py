"""Matrix-free (partial-assembly) operator application.

The reference always materializes the global sparse matrix through
NGSolve's assembly (``BilinearForm::Assemble``); here the per-element
matrix batches the compiled assembly program already produces can be
applied DIRECTLY: ``y = Σ_k scatter(dm_v_k, m_k @ x[dm_u_k])``.  On TPU
the batched ``(E, nd, nd) x (E, nd)`` contraction runs on the MXU and the
element batch is the only storage — the regime where matrix-free unfitted
operator evaluation wins (cf. the retrieved technique paper
"High-performance matrix-free unfitted finite element operator
evaluation", PAPERS.md): at order k the assembled row width grows like
nd(k) while the element batch stays a dense contraction.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnums=(2,))
def _pa_matvec(parts, x, nrows):
    y = jnp.zeros((nrows,), dtype=x.dtype)
    for m, dm_v, dm_u in parts:
        xe = x[dm_u]  # (E, ndu)
        ye = jnp.einsum("evu,eu->ev", m, xe)
        y = y.at[dm_v.reshape(-1)].add(ye.reshape(-1))
    return y


@partial(jax.jit, static_argnums=(1,))
def _pa_diagonal(parts, nrows):
    d = jnp.zeros((nrows,), dtype=parts[0][0].dtype)
    for m, dm_v, dm_u in parts:
        hit = dm_v[:, :, None] == dm_u[:, None, :]  # (E, ndv, ndu)
        contrib = jnp.sum(jnp.where(hit, m, 0.0), axis=2)  # (E, ndv)
        d = d.at[dm_v.reshape(-1)].add(contrib.reshape(-1))
    return d


class PartialAssemblyOperator:
    """``y = A @ x`` from per-element matrix batches, never materializing A.

    ``parts``: list of ``(m (E, ndv, ndu), dm_v (E, ndv), dm_u (E, ndu))``
    — one entry per assembled integral (element rows, facet-patch /
    skeleton pair rows, ...), exactly the batches ``BilinearForm.Assemble``
    would scatter into the sparse matrix; by linearity the application
    equals the assembled matvec to round-off.
    """

    def __init__(self, parts, shape):
        self.parts = tuple(
            (jnp.asarray(m), jnp.asarray(dm_v), jnp.asarray(dm_u))
            for m, dm_v, dm_u in parts
        )
        self.shape = tuple(shape)

    def matvec(self, x):
        return _pa_matvec(self.parts, jnp.asarray(x), self.shape[0])

    __matmul__ = matvec

    def __mul__(self, x):
        return self.matvec(x)

    def diagonal(self):
        """Exact diagonal of the (never-materialized) matrix — the Jacobi
        preconditioner for CG/MINRES on this operator."""
        return _pa_diagonal(self.parts, self.shape[0])

    def nbytes(self):
        """Device bytes held by the element batches (storage comparison
        against an assembled matrix)."""
        return int(sum(int(np.prod(m.shape)) * m.dtype.itemsize
                       for m, _, _ in self.parts))
