"""Channel-lattice stencil operator: zero-gather matvec on structured meshes.

On a structured lattice mesh the order-k Lagrange dofs sit on the refined
lattice with spacing h/k: scaling a dof's position by k/h gives integer
coordinates q, and the parity p = q mod k assigns each dof to one of k^dim
CHANNELS (order 2 in 3D: 1 vertex channel + 7 edge-midpoint channels),
with SITE s = q // k on the cell lattice.  Every matrix nonzero (i, j)
then lives on a (channel_i, channel_j, site_j - site_i) stencil whose
site-offset is bounded by the form's support (nearest-neighbor elements →
|offset|_inf <= 1, including facet-patch couplings), so the assembled
operator is a set of per-(ci, cj, offset) value arrays over the site grid
and ``y = A x`` is a static sequence of shifted-window multiply-adds —
ZERO gather/scatter instructions in the hot loop.  This is the order-k
generalization of the flagship's 27-diagonal P1 DIA path
(docs/PERFORMANCE.md "DIA beats ELL"); measured motivation: the order-2
nx=16 matrix-free apply was gather-latency-bound at ~96 ms/iteration
where its HBM bound is ~0.1 ms.

The reference has no counterpart (NGSolve assembles generic sparse
matrices; cf. xfem/symboliccutbfi.cpp element loops) — this is the
TPU-native answer for its order-2/3 operating point on structured meshes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def lattice_dof_map(space):
    """dof -> (channel, site) for a Lagrange space whose dof nodes form a
    uniform lattice.  Returns None when they don't (unstructured mesh,
    curved/non-affine element maps, compound/enriched spaces)."""
    mesh = getattr(space, "mesh", None)
    order = getattr(space, "order", 0)
    if mesh is None or order < 1:
        return None
    if getattr(space, "dof_rep_elem", None) is None:
        return None
    V = np.asarray(mesh.vertices_np, dtype=np.float64)
    dim = V.shape[1]
    if dim not in (2, 3):
        return None
    ev = mesh.elements_np[space.dof_rep_elem]          # (ndof, nvert)
    nvert = ev.shape[1]
    if nvert != dim + 1:                               # simplices only
        return None
    verts = V[ev]                                      # (ndof, nvert, dim)
    ref = np.asarray(space.dof_rep_ref, dtype=np.float64)  # (ndof, dim)
    phys = verts[:, 0] + np.einsum(
        "ndk,nd->nk", verts[:, 1:] - verts[:, :1], ref)
    # per-axis vertex lattice: uniform spacing or bail
    axes = []
    for d in range(dim):
        u = np.unique(np.round(V[:, d], 10))
        if len(u) < 2:
            return None
        steps = np.diff(u)
        if not np.allclose(steps, steps[0], rtol=1e-6, atol=1e-12):
            return None
        axes.append(u)
    h = np.array([a[1] - a[0] for a in axes])
    mins = np.array([a[0] for a in axes])
    q = (phys - mins) / (h / order)
    qi = np.rint(q).astype(np.int64)
    if not np.allclose(q, qi, atol=1e-6):
        return None
    par = qi % order
    site = qi // order
    nchan = order ** dim
    chan = np.zeros(len(qi), dtype=np.int64)
    for d in range(dim):
        chan = chan * order + par[:, d]
    dims = tuple(len(a) for a in axes)                 # site grid extents
    if site.min() < 0 or (site >= np.array(dims)).any():
        return None
    # bijectivity: every dof owns a distinct (channel, site) slot
    flat = chan
    for d in range(dim):
        flat = flat * dims[d] + site[:, d]
    if len(np.unique(flat)) != space.ndof or len(flat) != space.ndof:
        return None
    return {"chan": chan, "site": site, "dims": dims, "nchan": nchan,
            "dim": dim}


@partial(jax.jit, static_argnums=(0, 1, 2))
def _stencil_apply(meta, dims, nchan, vals, chan, sites, x):
    """meta: static tuple of (ci, cj, offset...) per stencil table;
    vals: (ncombo,) + dims value arrays; chan/sites: dof permutation."""
    dim = len(dims)
    reach = max((max(abs(o) for o in m[2:]) for m in meta), default=1)
    idx = (chan,) + tuple(sites[:, d] for d in range(dim))
    X = jnp.zeros((nchan,) + dims, dtype=x.dtype).at[idx].set(x)
    pad = ((0, 0),) + ((reach, reach),) * dim
    Xp = jnp.pad(X, pad)
    Ys = [jnp.zeros(dims, dtype=x.dtype) for _ in range(nchan)]
    for k, m in enumerate(meta):
        ci, cj = m[0], m[1]
        sl = tuple(slice(reach + o, reach + o + dims[d])
                   for d, o in enumerate(m[2:]))
        Ys[ci] = Ys[ci] + vals[k] * Xp[(cj,) + sl]
    return jnp.stack(Ys)[idx]


class LatticeStencilOperator:
    """``y = A @ x`` as channel-lattice stencil windows (see module doc).

    Built from the same per-element matrix batches as
    :class:`PartialAssemblyOperator`; numerically equal to the assembled
    matvec by construction (exact accumulation of the same contributions,
    in f64 on the host)."""

    def __init__(self, parts, dofmap, nrows, dtype):
        chan, site, dims = dofmap["chan"], dofmap["site"], dofmap["dims"]
        nchan, dim = dofmap["nchan"], dofmap["dim"]
        rows, cols, vals = [], [], []
        for m, dm_v, dm_u in parts:
            m = np.asarray(m, dtype=np.float64)
            dv = np.asarray(dm_v, dtype=np.int64)
            du = np.asarray(dm_u, dtype=np.int64)
            E, ndv, ndu = m.shape
            rows.append(np.broadcast_to(dv[:, :, None], m.shape).ravel())
            cols.append(np.broadcast_to(du[:, None, :], m.shape).ravel())
            vals.append(m.ravel())
        r = np.concatenate(rows)
        c = np.concatenate(cols)
        v = np.concatenate(vals)
        ci, cj = chan[r], chan[c]
        si, sj = site[r], site[c]
        d = sj - si                                    # (N, dim)
        reach = int(np.abs(d).max()) if len(d) else 1
        span = 2 * reach + 1
        # combo key: (ci, cj, offset) mixed radix
        key = ci * nchan + cj
        for dd in range(dim):
            key = key * span + (d[:, dd] + reach)
        present, inv = np.unique(key, return_inverse=True)
        S = int(np.prod(dims))
        fs = np.zeros(len(r), dtype=np.int64)
        for dd in range(dim):
            fs = fs * dims[dd] + si[:, dd]
        acc = np.zeros((len(present), S), dtype=np.float64)
        np.add.at(acc, (inv, fs), v)
        meta = []
        for pk in present:
            offs = []
            rest = int(pk)
            for dd in range(dim - 1, -1, -1):
                offs.append(rest % span - reach)
                rest //= span
            offs.reverse()
            cjj = rest % nchan
            cii = rest // nchan
            meta.append((int(cii), int(cjj)) + tuple(int(o) for o in offs))
        self._meta = tuple(meta)
        self._dims = tuple(int(x_) for x_ in dims)
        self._nchan = int(nchan)
        self._vals = jnp.asarray(
            acc.reshape((len(present),) + self._dims), dtype=dtype)
        self._chan = jnp.asarray(chan, dtype=jnp.int32)
        self._sites = jnp.asarray(site, dtype=jnp.int32)
        self.shape = (nrows, nrows)
        self.ncombo = len(present)
        self.reach = reach

    def matvec(self, x):
        return _stencil_apply(self._meta, self._dims, self._nchan,
                              self._vals, self._chan, self._sites,
                              jnp.asarray(x))

    __matmul__ = matvec

    def __mul__(self, x):
        return self.matvec(x)

    def diagonal(self):
        """Exact matrix diagonal (Jacobi preconditioner)."""
        dim = len(self._dims)
        zero = (0,) * dim
        d = jnp.zeros((self._nchan,) + self._dims, dtype=self._vals.dtype)
        for k, m in enumerate(self._meta):
            if m[0] == m[1] and m[2:] == zero:
                d = d.at[m[0]].add(self._vals[k])
        idx = (self._chan,) + tuple(self._sites[:, dd] for dd in range(dim))
        return d[idx]

    def nbytes(self):
        """Device bytes of the stencil tables."""
        return int(self._vals.size * self._vals.dtype.itemsize)
