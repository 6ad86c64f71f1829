"""Performance-SHAPE guards for the flagship lattice fast path.

The round-4 lesson (commit 568ebdd): a runtime active-dof mask introduced a
scatter-max into ``assemble_vals_lattice`` and silently HALVED on-chip
assembly throughput (13.6M -> 6.4M elts/s) — nothing in the suite failed.
These tests pin the performance-critical structure of the compiled program
so a regression of that shape fails CI instead of shipping:

1. the lattice assembly + DIA-CG pipeline HLO contains ZERO scatter and
   ZERO gather instructions (the whole point of the lattice design:
   corner data are shifted lattice slices, global assembly is windowed
   lattice adds, SpMV is static shifted slices — reference counterpart
   builds per-element dense matrices and scatters,
   xfem/symboliccutbfi.cpp:246-346);
2. the XLA cost model's FLOP and HBM-byte counts stay inside a ±30%
   envelope of the recorded baseline — a doubled pass over the operand
   tables or an accidental f64 promotion moves either far outside.

Lowered on the CPU backend (cost model + HLO text are backend-portable for
these properties; the program is the same one bench.py jits on TPU).
"""
import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ngsxfem_tpu.models.poisson import UnfittedPoisson
from ngsxfem_tpu.solvers.sparse import dia_matvec
from ngsxfem_tpu.solvers.krylov import cg

NX = 8
CG_ITERS = 50
# recorded 2026-08-20 (jax 0.9.0, CPU lowering, f32 compute):
#   pipeline flops=3.104e8, bytes=6.551e7 at ne=3072, ndof=729
BASE_FLOPS = 3.104e8
BASE_BYTES = 6.551e7
ENVELOPE = 0.30


def _op_counts(hlo_text, ops):
    """Count ACTUAL HLO instructions (not fusion names) per op."""
    return {
        op: len(re.findall(rf"^\s*[%\w.\-]+ = [^\n]*\b{op}\(", hlo_text,
                           re.M))
        for op in ops
    }


@pytest.fixture(scope="module")
def compiled_pipeline():
    m = UnfittedPoisson(nx=NX, dim=3, order=1, dtype=jnp.float32)
    dst = m.dia_structure()
    offs = dst["offsets"]
    k0 = int(np.searchsorted(offs, 0))
    dd_static = {k: v for k, v in dst.items() if "slots" not in k}
    dd = {k: jnp.asarray(v) for k, v in dst.items() if "slots" in k}

    def pipeline(v, l, b, dd):
        V, n = m.assemble_vals_lattice(v, l, {**dd_static, **dd})
        dinv = jnp.where(jnp.abs(V[k0]) > 1e-30, 1.0 / V[k0], 1.0)
        x, _, res = cg(lambda z: dia_matvec(offs, V, z), b,
                       M=lambda r: dinv * r, maxiter=CG_ITERS, tol=0.0)
        return x, res, n

    b = jnp.asarray(np.where(m.active_dofs[dst["perm_inv"]], 1.0, 0.0),
                    jnp.float32)
    args = (m.vertices.astype(jnp.float32), m.lset, b, dd)
    comp = jax.jit(pipeline).lower(*args).compile()
    return m, comp


def test_pipeline_hlo_is_scatter_and_gather_free(compiled_pipeline):
    """The compiled assemble+solve program must stay scatter/gather-free —
    the structural property the whole lattice fast path exists for."""
    _, comp = compiled_pipeline
    counts = _op_counts(comp.as_text(),
                        ("scatter", "gather", "dynamic-slice", "sort"))
    assert counts["scatter"] == 0, counts
    assert counts["gather"] == 0, counts
    # dynamic-slice (beyond the CG while-loop's trip bookkeeping) and sort
    # would signal an indexed/serialized path sneaking in
    assert counts["sort"] == 0, counts
    assert counts["dynamic-slice"] <= 2, counts


def test_pipeline_cost_model_envelope(compiled_pipeline):
    """XLA cost-model FLOPs/bytes inside ±30% of the recorded baseline:
    catches doubled passes, accidental f64 promotion, or a lost fusion."""
    _, comp = compiled_pipeline
    c = comp.cost_analysis()
    if isinstance(c, list):
        c = c[0]
    flops = float(c.get("flops", -1.0))
    byts = float(c.get("bytes accessed", -1.0))
    if flops <= 0 or byts <= 0:
        pytest.skip("cost model unavailable in this jax build")
    assert abs(flops - BASE_FLOPS) <= ENVELOPE * BASE_FLOPS, (
        f"pipeline FLOPs {flops:.3e} left the ±30% envelope of "
        f"{BASE_FLOPS:.3e} — perf-shape regression?")
    assert abs(byts - BASE_BYTES) <= ENVELOPE * BASE_BYTES, (
        f"pipeline HBM bytes {byts:.3e} left the ±30% envelope of "
        f"{BASE_BYTES:.3e} — perf-shape regression?")


def test_pipeline_executes(compiled_pipeline):
    """The lowered program actually runs and solves (guards against pinning
    a broken program's shape)."""
    m, comp = compiled_pipeline
    dst = m.dia_structure()
    dd = {k: jnp.asarray(v) for k, v in dst.items() if "slots" in k}
    b = jnp.asarray(np.where(m.active_dofs[dst["perm_inv"]], 1.0, 0.0),
                    jnp.float32)
    x, res, n = comp(m.vertices.astype(jnp.float32), m.lset, b, dd)
    bn = float(jnp.linalg.norm(b))
    assert float(res) < 0.5 * bn
    assert np.isfinite(np.asarray(x)).all()
