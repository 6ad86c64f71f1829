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

TPU apply path: the contraction output is REDUCED INTO the global vector
via a precomputed inverse (gather) table, not a scatter-add — a TPU
scatter-add with duplicate indices serializes (measured 111 ms/iteration
for the order-2 nx=16 operator, ~1400x its HBM bound), while the
row-gather+reduce of the same contributions vectorizes.  Parts whose
per-row multiplicity would blow up the table (> _GATHER_MULT_CAP) keep
the scatter — the same split `models/poisson.ell_gather_structure` uses
for the ghost-penalty stream.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# a part joins the gather table only if its own max per-row multiplicity
# is bounded (element streams: ~vertex valence ~24 on 3D tets; facet-patch
# streams: ~patch count of a band dof).  Beyond this, table memory and
# per-row padding waste beat the scatter cost.
_GATHER_MULT_CAP = 128


@partial(jax.jit, static_argnums=(2,))
def _pa_matvec(parts, x, nrows):
    y = jnp.zeros((nrows,), dtype=x.dtype)
    for m, dm_v, dm_u in parts:
        xe = x[dm_u]  # (E, ndu)
        ye = jnp.einsum("evu,eu->ev", m, xe)
        y = y.at[dm_v.reshape(-1)].add(ye.reshape(-1))
    return y


@partial(jax.jit, static_argnums=(3,))
def _pa_matvec_gather(gparts, sparts, table, nrows, x):
    """Gather-table apply: concatenate the per-part contraction outputs
    into one stream (+ trailing zero pad slot), then reduce each global
    row by gathering its (padded) contribution list."""
    streams = []
    for m, dm_v, dm_u in gparts:
        xe = x[dm_u]
        streams.append(jnp.einsum("evu,eu->ev", m, xe).reshape(-1))
    streams.append(jnp.zeros((1,), dtype=x.dtype))  # pad target
    stream = jnp.concatenate(streams)
    y = jnp.sum(stream[table], axis=1)
    for m, dm_v, dm_u in sparts:  # high-multiplicity leftovers: scatter
        xe = x[dm_u]
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


def _gather_table(gparts, nrows):
    """Inverse map of the concatenated contribution stream: for each
    global row, the padded list of flat stream indices landing in it
    (pad = one past the stream end -> the zero slot)."""
    rows = np.concatenate(
        [np.asarray(dm_v).reshape(-1) for _, dm_v, _ in gparts])
    nstream = len(rows)
    counts = np.bincount(rows, minlength=nrows)
    mult = int(counts.max()) if nstream else 1
    table = np.full((nrows, max(mult, 1)), nstream, dtype=np.int32)
    order = np.argsort(rows, kind="stable")
    srt = rows[order]
    start = np.zeros(nrows + 1, dtype=np.int64)
    np.cumsum(counts, out=start[1:])
    pos = np.arange(nstream) - start[srt]
    table[srt, pos] = order.astype(np.int32)
    return table


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
        # split parts by per-row multiplicity; build the inverse table for
        # the bounded ones (host-side, once per operator)
        gparts, sparts = [], []
        for p in self.parts:
            rows = np.asarray(p[1]).reshape(-1)
            mult = int(np.bincount(rows, minlength=shape[0]).max()) \
                if rows.size else 0
            (gparts if mult <= _GATHER_MULT_CAP else sparts).append(p)
        self._gparts, self._sparts = tuple(gparts), tuple(sparts)
        self._table = (jnp.asarray(_gather_table(gparts, shape[0]))
                       if gparts else None)

    def matvec(self, x):
        if self._table is not None:
            return _pa_matvec_gather(self._gparts, self._sparts,
                                     self._table, self.shape[0],
                                     jnp.asarray(x))
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
