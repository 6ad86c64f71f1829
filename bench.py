"""Benchmark: 3D fictitious-domain Poisson — FULL pipeline on one TPU chip.

The BASELINE.json headline config (reference workload
``py_tutorials/fictdom_ghostpen.py``): level-set classification, straight-cut
quadrature, cut stiffness + Nitsche + facet-patch ghost penalty element
matrices, scatter into the global ELL operator, and a CG solve — measured as
separate stages and as one fused program.

Baseline constant: single-node NGSolve/ngsxfem assembles roughly 2e4 cut
3D P1 elements/sec/core (cut-rule construction dominated).  This is an
ESTIMATE — the reference publishes no benchmark numbers and NGSolve is not
installable in this environment (see BASELINE.md); the JSON labels it so.
vs_baseline = pipeline elements/sec / 2e4; the driver target is >= 20.

MEASUREMENT REGIME (tunneled runtime): on the axon single-chip tunnel,
execution is LAZY — dispatch and even ``block_until_ready`` return before
any computation happens (a 50- and an 800-iteration CG "complete" in the
same 40 us), so async timings measure enqueue latency, not work.  The only
observable-completion regime is the synchronous one, entered permanently by
the first device->host read: each launch then runs to completion before
returning, at the cost of ~ms tunnel round trips per launch AND per
lax.while_loop iteration.  This benchmark therefore forces the synchronous
regime up front and times completed executions.  The numbers are LOWER
bounds on real-chip throughput: they include tunnel round-trip overhead that
does not exist on a directly-attached TPU, and the CG loop pays a round trip
per iteration (~6 ms) where real hardware runs the whole loop on device.

Prints ONE JSON line.
"""
import os
import sys
import time
import json

os.environ.setdefault("NGSXFEM_TPU_X64", "0")  # f32 compute path for speed
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

# enter the synchronous (observable-completion) regime BEFORE anything else
_ = float(jnp.sum(jnp.ones((8, 8))))

NGSOLVE_BASELINE_ELTS_PER_SEC = 2.0e4  # estimate, no published number exists
CG_ITERS = 50


def _time(fn, *args, reps=3):
    """Synchronous per-call timing (executions complete before returning in
    this regime); median of `reps` calls."""
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], out


def bench_pipeline(dtype, nx, reps):
    from ngsxfem_tpu.models.poisson import UnfittedPoisson
    from ngsxfem_tpu.solvers.krylov import cg

    model = UnfittedPoisson(nx=nx, dim=3, order=1, dtype=dtype)
    vals = model.lset_np[model.mesh.elements_np]
    ncut_host = int((((vals < 0).any(1)) & ((vals > 0).any(1))).sum())
    cap = int(ncut_host * 1.2) + 8
    struct = model.ell_structure()          # host numpy tables
    # big index tables enter as ARGUMENTS (baked literals exceed the remote
    # compiler's request limit, HTTP 413)
    K = struct["K"]
    sd = {k: jnp.asarray(v) for k, v in struct.items() if k != "K"}

    @jax.jit
    def assemble(vertices, lset, st):
        ell_vals, n = model.assemble_ell_vals(vertices, lset, cap,
                                              dict(st, K=K))
        return ell_vals, n

    @jax.jit
    def solve(ell_vals, cols, b):
        rows_idx = jnp.arange(cols.shape[0])[:, None]
        diag = jnp.sum(jnp.where(cols == rows_idx, ell_vals, 0.0), axis=1)
        dinv = jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 1.0)
        mv = lambda x: jnp.sum(ell_vals * x[cols], axis=1)
        x, k, res = cg(mv, b, maxiter=CG_ITERS, tol=0.0, M=lambda r: dinv * r)
        return x, res

    @jax.jit
    def pipeline(vertices, lset, st, b):
        ell_vals, n = model.assemble_ell_vals(vertices, lset, cap,
                                              dict(st, K=K))
        x, res = solve(ell_vals, st["ell_cols"], b)
        return x, res, n

    v, l = model.vertices, model.lset
    b = jnp.where(jnp.asarray(model.active_dofs), 1.0, 0.0).astype(dtype)

    ell_vals, n_dev = assemble(v, l, sd)
    jax.block_until_ready(ell_vals)
    assert int(n_dev) <= cap, "cut capacity overflow"

    t_asm, _ = _time(assemble, v, l, sd, reps=reps)
    t_slv, (xs, res) = _time(solve, ell_vals, sd["ell_cols"], b, reps=reps)
    t_pipe, (_, res_p, _) = _time(pipeline, v, l, sd, b, reps=reps)

    r0 = float(jnp.linalg.norm(b))
    assert float(res_p) < 0.1 * r0, (float(res_p), r0)

    return {
        "ne": model.mesh.ne,
        "ndof": model.ndof,
        "asm_elts_per_sec": model.mesh.ne / t_asm,
        "solve_iters_per_sec": CG_ITERS / t_slv,
        "pipe_elts_per_sec": model.mesh.ne / t_pipe,
        "cg_rel_residual": float(res_p) / r0,
    }


def main():
    nx = int(os.environ.get("BENCH_NX", "48"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    if os.environ.get("BENCH_INNER_F64") == "1":
        jax.config.update("jax_enable_x64", True)
        r64 = bench_pipeline(jnp.float64, max(min(nx // 2, 16), 8),
                             max(2, reps))
        print(json.dumps({"f64_pipe": r64["pipe_elts_per_sec"]}))
        return

    r32 = bench_pipeline(jnp.float32, nx, reps)

    f64 = None
    if os.environ.get("BENCH_F64", "1") != "0":
        import subprocess

        try:
            env = dict(os.environ, BENCH_INNER_F64="1")
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, timeout=1200)
            f64 = round(json.loads(out.stdout.strip().splitlines()[-1])["f64_pipe"], 1)
        except Exception:
            f64 = None

    out = {
        "metric": "3d_fictdom_pipeline_throughput",
        "value": round(r32["pipe_elts_per_sec"], 1),
        "unit": "elements/sec",
        "vs_baseline": round(
            r32["pipe_elts_per_sec"] / NGSOLVE_BASELINE_ELTS_PER_SEC, 2),
        "baseline_note": "2e4 elts/s NGSolve figure is an unmeasured estimate",
        "timing_note": ("synchronous completed-execution timings over the "
                        "tunneled runtime; lower bounds on real-chip rates "
                        "(~ms round trip per launch and per CG iteration)"),
        "assembly_elts_per_sec": round(r32["asm_elts_per_sec"], 1),
        "solve_iters_per_sec": round(r32["solve_iters_per_sec"], 1),
        "cg_iters": CG_ITERS,
        "f64_pipeline_elts_per_sec": f64,
        "ne": r32["ne"],
        "ndof": r32["ndof"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
