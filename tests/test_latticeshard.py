"""Lattice-slab-sharded DIA operator (parallel/latticeshard.py): the
sharded matvec with ppermute halo exchange equals the single-device DIA
matvec, including the multi-hop case (halo wider than a slab), and a full
sharded CG reproduces the single-device solution."""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngsxfem_tpu.models.poisson import UnfittedPoisson
from ngsxfem_tpu.solvers.sparse import dia_matvec
from ngsxfem_tpu.parallel.latticeshard import LatticeShard
from ngsxfem_tpu.solvers.krylov import cg


def _setup(nx=12):
    m = UnfittedPoisson(nx=nx, dim=3, order=1, dtype=jnp.float64)
    dst = m.dia_structure()
    V, _ = jax.jit(lambda v, l: m.assemble_vals_lattice(v, l, dst))(
        m.vertices, m.lset)
    return m, dst, V


def test_sharded_matvec_matches_single():
    m, dst, V = _setup()
    x = jnp.asarray(np.random.default_rng(0).standard_normal(m.ndof))
    y_ref = dia_matvec(dst["offsets"], V, x)
    for nd in (2, 4, 8):   # nd=8 with nv1=13 forces multi-hop halo (H > L)
        ls = LatticeShard(dst["offsets"], m.nx + 1, 3,
                          devices=jax.devices()[:nd])
        mv = ls.matvec_fn()
        y = ls.unpad_x(jax.jit(mv)(ls.pad_table(V), ls.pad_x(x)))
        assert float(jnp.max(jnp.abs(y_ref - y))) < 1e-12, nd


def test_sharded_cg_matches_single():
    m, dst, V = _setup()
    k0 = int(np.searchsorted(dst["offsets"], 0))
    dinv0 = 1.0 / jnp.where(jnp.abs(V[k0]) > 1e-30, V[k0], 1.0)
    b0 = jnp.asarray(np.where(m.active_dofs[dst["perm_inv"]], 1.0, 0.0))
    ls = LatticeShard(dst["offsets"], m.nx + 1, 3)
    mv = ls.matvec_fn()
    Vp, b, dinv = ls.pad_table(V), ls.pad_x(b0), ls.pad_x(dinv0)
    x_sh, _, _ = jax.jit(
        lambda Vp, b: cg(lambda z: mv(Vp, z), b, M=lambda r: dinv * r,
                         maxiter=400, tol=1e-10))(Vp, b)
    x_one, _, _ = cg(lambda z: dia_matvec(dst["offsets"], V, z), b0,
                     M=lambda r: dinv0 * r, maxiter=400, tol=1e-10)
    assert float(jnp.max(jnp.abs(ls.unpad_x(x_sh) - x_one))) < 1e-9
