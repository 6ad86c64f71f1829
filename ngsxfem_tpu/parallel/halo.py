"""Dof-sharded SPMD partitioning: interior/shared dof decomposition.

The SURVEY §2.8 halo design, TPU-shaped: instead of replicating dof vectors
and psum-ing full-length buffers per matvec (the DP-replication path in
models/poisson.spmd_step), elements are partitioned into contiguous chunks
and every dof is classified as *interior* to exactly one chunk or *shared*
(touched by rows of more than one chunk).  Interior dofs live sharded on
their chunk's device and need NO communication; only the shared-dof buffer
(the halo layer — O(n_devices * N^(d-1)/d) dofs for slab partitions) is
reduced with one psum per operator application.  This is the XLA-collective
equivalent of point-to-point halo exchange: the psum payload is proportional
to the halo, not to ndof.
"""
from __future__ import annotations

import numpy as np


class DofPartition:
    """Host-side partition tables.

    Layout per device c: local vector = [interior dofs of c (padded to
    Ni_max) | shared dofs (S, replicated)].  `e2d_local` indexes this layout.
    """

    def __init__(self, ndof: int, row_dofmaps, row_chunks, n: int):
        """row_dofmaps: list of (R_i, nd_i) global-dof row maps (elements,
        facet patches, ...); row_chunks: matching (R_i,) chunk assignment."""
        self.n = n
        self.ndof = ndof
        touch = np.zeros((n, ndof), dtype=bool)
        for dm, ch in zip(row_dofmaps, row_chunks):
            for c in range(n):
                sel = dm[ch == c]
                if len(sel):
                    touch[c, sel.ravel()] = True
        cnt = touch.sum(axis=0)
        untouched = cnt == 0
        self.shared = (cnt > 1)
        interior = (cnt == 1)
        # untouched dofs (e.g. inactive far-field dofs) are distributed
        # round-robin as interior so every dof has exactly one owner
        owner = np.full(ndof, -1, dtype=np.int32)
        owner[interior] = np.argmax(touch[:, interior], axis=0)
        nun = int(untouched.sum())
        if nun:
            owner[untouched] = np.arange(nun, dtype=np.int32) % n
        self.sh_ids = np.nonzero(self.shared)[0].astype(np.int32)
        self.S = len(self.sh_ids)
        int_mask = ~self.shared
        self.Ni = np.array([(int_mask & (owner == c)).sum() for c in range(n)])
        self.Ni_max = int(self.Ni.max()) if n else 0
        self.int_ids = np.full((n, self.Ni_max), -1, dtype=np.int32)
        # local index of every dof: interior -> slot in its chunk,
        # shared -> Ni_max + shared slot
        self.loc_of_dof = np.full((n, ndof), -1, dtype=np.int32)
        sh_slot = np.full(ndof, -1, dtype=np.int32)
        sh_slot[self.sh_ids] = np.arange(self.S, dtype=np.int32)
        for c in range(n):
            ids = np.nonzero(int_mask & (owner == c))[0].astype(np.int32)
            self.int_ids[c, :len(ids)] = ids
            self.loc_of_dof[c, ids] = np.arange(len(ids), dtype=np.int32)
            self.loc_of_dof[c, self.sh_ids] = self.Ni_max + sh_slot[self.sh_ids]
        self.owner = owner

    def localize_rows(self, dofmap, chunks):
        """(R, nd) global dof map -> (R, nd) local-layout indices per row's
        chunk.  Every referenced dof must be interior-to-that-chunk or shared."""
        out = self.loc_of_dof[chunks[:, None], dofmap]
        if (out < 0).any():
            raise ValueError("row references a dof not visible to its chunk")
        return out.astype(np.int32)

    def split_vector(self, x):
        """global (ndof,) -> (x_int (n, Ni_max), x_sh (S,)) host numpy."""
        x = np.asarray(x)
        x_int = np.zeros((self.n, self.Ni_max), dtype=x.dtype)
        for c in range(self.n):
            ids = self.int_ids[c]
            m = ids >= 0
            x_int[c, m] = x[ids[m]]
        return x_int, x[self.sh_ids]

    def merge_vector(self, x_int, x_sh):
        """inverse of split_vector."""
        out = np.zeros(self.ndof, dtype=np.asarray(x_sh).dtype)
        for c in range(self.n):
            ids = self.int_ids[c]
            m = ids >= 0
            out[ids[m]] = np.asarray(x_int)[c, m]
        out[self.sh_ids] = np.asarray(x_sh)
        return out
