"""Benchmark: 3D fictitious-domain Poisson cut assembly throughput (elts/sec).

The BASELINE.json headline config (reference workload
``py_tutorials/fictdom_ghostpen.py``): level-set classification, straight-cut
quadrature rule construction, cut stiffness + Nitsche + facet-patch ghost
penalty element matrices — all fused into one XLA program on the TPU.

Baseline constant: single-node NGSolve/ngsxfem assembles roughly 2e4 cut
3D P1 elements/sec/core (cut-rule construction dominated; no published number
exists — see BASELINE.md).  vs_baseline = measured / 2e4; the driver target
is >= 20.

Prints ONE JSON line.
"""
import os
import sys
import time
import json

os.environ.setdefault("NGSXFEM_TPU_X64", "0")  # f32 compute path for speed
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

NGSOLVE_BASELINE_ELTS_PER_SEC = 2.0e4


def main():
    from ngsxfem_tpu.models.poisson import UnfittedPoisson

    import numpy as np

    nx = int(os.environ.get("BENCH_NX", "32"))
    model = UnfittedPoisson(nx=nx, dim=3, order=1, dtype=jnp.float32)

    # fixed-capacity compaction of cut elements (20% headroom)
    vals = model.lset_np[model.mesh.elements_np]
    ncut = int((((vals < 0).any(1)) & ((vals > 0).any(1))).sum())
    cap = int(ncut * 1.2) + 8

    @jax.jit
    def assemble(vertices, lset):
        A_std, A_cut, cut_ids, n = model.elmats_compact(
            vertices, lset, model.mesh.elements, model.el2dof, cap
        )
        return A_std, A_cut, model.gp_mats(vertices), n

    v, l = model.vertices, model.lset
    # warmup / compile
    A, C, G, n = assemble(v, l)
    A.block_until_ready()
    assert int(n) <= cap, "cut capacity overflow"

    reps = int(os.environ.get("BENCH_REPS", "10"))
    t0 = time.perf_counter()
    for _ in range(reps):
        A, C, G, n = assemble(v, l)
    A.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    elts_per_sec = model.mesh.ne / dt
    print(json.dumps({
        "metric": "3d_fictdom_cut_assembly_throughput",
        "value": round(elts_per_sec, 1),
        "unit": "elements/sec",
        "vs_baseline": round(elts_per_sec / NGSOLVE_BASELINE_ELTS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
