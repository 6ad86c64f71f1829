"""Lattice-sharded DIA operator: slab decomposition + ppermute halo exchange.

The TPU-native multichip form of the flagship stencil operator
(models/poisson.dia_structure): the vertex lattice is split into contiguous
slabs of planes along the slowest axis, one slab per device.  A DIA matvec
needs x only within ``H = ceil(max|offset| / plane)`` planes of the slab
boundary, so each application exchanges exactly TWO halo buffers with the
lattice neighbors via ``lax.ppermute`` — point-to-point traffic proportional
to the slab surface, riding the ICI ring (SURVEY.md §2.8; contrast with the
replicate-and-psum path in models/poisson.spmd_step whose payload is O(n)).
``ppermute`` delivers zeros for absent partners, which is exactly the
zero-padding the DIA boundary semantics require.

Everything composes under jit: ``matvec`` is a shard_map region returning a
global-view array, so an outer CG (dots, axpys) is partitioned by GSPMD
around it.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


class LatticeShard:
    """Slab-sharded DIA operator over a 1D device mesh.

    offsets: host ints (DIA diagonals, vertex-lex numbering)
    nv1, d:  lattice extent per axis and dimension (n = nv1**d)
    devices: sequence of jax devices (defaults to all)
    """

    def __init__(self, offsets, nv1, d, devices=None):
        self.offsets = [int(o) for o in np.asarray(offsets).tolist()]
        self.nv1 = int(nv1)
        self.d = int(d)
        self.plane = self.nv1 ** (self.d - 1)
        self.n = self.nv1 ** self.d
        devices = list(devices if devices is not None else jax.devices())
        self.ndev = len(devices)
        self.mesh = Mesh(np.array(devices), ("z",))
        self.H = max(1, int(-(-max(abs(o) for o in self.offsets)
                              // self.plane)))
        # pad the plane axis so every device owns the same number of planes
        self.L = -(-self.nv1 // self.ndev)
        self.Pn = self.L * self.ndev
        self.n_pad = self.Pn * self.plane
        self.x_spec = NamedSharding(self.mesh, P("z"))
        self.v_spec = NamedSharding(self.mesh, P(None, "z"))

    # -- host/device packing --------------------------------------------------
    def pad_x(self, x):
        """(n,) lattice vector -> (n_pad,) slab-sharded device array."""
        xp = jnp.pad(x, (0, self.n_pad - self.n))
        return jax.device_put(xp, self.x_spec)

    def unpad_x(self, xp):
        return xp[: self.n]

    def pad_table(self, V):
        """(n_off, n) DIA table -> (n_off, n_pad) slab-sharded."""
        Vp = jnp.pad(V, ((0, 0), (0, self.n_pad - self.n)))
        return jax.device_put(Vp, self.v_spec)

    # -- sharded matvec --------------------------------------------------------
    def matvec_fn(self):
        """Returns mv(Vp, xp) -> yp: slab-local DIA matvec with ppermute
        halo exchange (jit/GSPMD composable)."""
        offs = self.offsets
        hp = self.H * self.plane
        Lp = self.L * self.plane
        nd = self.ndev
        fwd = [(i, i + 1) for i in range(nd - 1)]
        bwd = [(i + 1, i) for i in range(nd - 1)]

        hops = max(1, -(-self.H // self.L))  # halo may span several slabs

        def mv_local(Vl, xl):
            # Vl (n_off, Lp), xl (Lp,) — one slab each
            if nd > 1 and hp <= Lp:
                # halo fits inside the neighbor slab: exchange ONLY the
                # hp-sized boundary windows (the slab surface), not the full
                # slab — ppermute zeros for absent ring ends give the DIA
                # zero-boundary semantics for free
                from_prev = lax.ppermute(xl[-hp:], "z", fwd)
                from_next = lax.ppermute(xl[:hp], "z", bwd)
            elif nd > 1:
                # halo spans several slabs: relay whole slabs (Lp per hop is
                # already the minimum per-hop payload when hp > Lp)
                prev_parts, next_parts = [], []
                cur_f, cur_b = xl, xl
                for _ in range(hops):
                    cur_f = lax.ppermute(cur_f, "z", fwd)
                    cur_b = lax.ppermute(cur_b, "z", bwd)
                    prev_parts.insert(0, cur_f)
                    next_parts.append(cur_b)
                # hops = ceil(H/L) guarantees the collected ring covers the
                # halo: hops * Lp >= hp (static host values)
                assert hops * Lp >= hp, (hops, Lp, hp)
                from_prev = jnp.concatenate(prev_parts)[-hp:]
                from_next = jnp.concatenate(next_parts)[:hp]
            else:
                from_prev = jnp.zeros((hp,), xl.dtype)
                from_next = jnp.zeros((hp,), xl.dtype)
            xe = jnp.concatenate([from_prev, xl, from_next])
            y = None
            for k, o in enumerate(offs):
                t = Vl[k] * lax.dynamic_slice_in_dim(xe, hp + o, Lp)
                y = t if y is None else y + t
            return y

        return shard_map(mv_local, mesh=self.mesh,
                         in_specs=(P(None, "z"), P("z")),
                         out_specs=P("z"))
