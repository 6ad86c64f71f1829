"""Benchmark: 3D fictitious-domain Poisson — FULL pipeline on one TPU chip.

The BASELINE.json headline config (reference workload
``py_tutorials/fictdom_ghostpen.py``): level-set classification, straight-cut
quadrature, cut stiffness + Nitsche + facet-patch ghost penalty element
matrices, scatter into the global ELL operator, and a CG solve.

Baseline constant: single-node NGSolve/ngsxfem assembles roughly 2e4 cut
3D P1 elements/sec/core (cut-rule construction dominated).  This is an
ESTIMATE — the reference publishes no benchmark numbers and NGSolve is not
installable in this environment (see BASELINE.md); the JSON labels it so.
vs_baseline = pipeline elements/sec / 2e4; the driver target is >= 20.

MEASUREMENT REGIMES (tunneled runtime, see docs/PERFORMANCE.md):
1. SYNCHRONOUS per-call: on the axon tunnel execution is LAZY — only the
   synchronous regime (entered by the first device->host read) observes
   completed work, at the cost of streaming operands (~500 MB/s) per launch.
   Per-call rates are tunnel-bandwidth-bound LOWER bounds.
2. AMORTIZED K-iteration: K full pipeline iterations run INSIDE one jitted
   lax.scan with a carried data dependency (each iteration perturbs the
   level set by the previous solution scaled to 1e-30, so no iteration can
   be dead-code-eliminated and the chain cannot be reordered).  Operands
   stream once; time/K approaches the on-chip per-iteration cost.
3. MFU/ROOFLINE ESTIMATE: FLOP and HBM-byte counts of the exact pipeline
   HLO from XLA's own cost model (lower+compile on the CPU backend of the
   identical program, jax .cost_analysis()), divided by the amortized time:
   mfu_estimate = flops/t_amortized / 197e12 (TPU v5e bf16 peak);
   hbm_roofline_fraction = (bytes/819e9) / t_amortized (1.0 = the program
   runs exactly at v5e HBM speed of light).  The cost model comes from the
   same backend/compiler as the timed executable.

The MG-preconditioned CONVERGED solve (rel. residual <= 1e-8, asserted)
uses the functional cut multigrid (solvers/mg.py FunctionalELLMG) over the
nested [nx/4, nx/2, nx] hierarchy and is compared against Jacobi-CG to the
same tolerance.

Prints ONE JSON line.
"""
import os
import sys
import time
import json
import subprocess

os.environ.setdefault("NGSXFEM_TPU_X64", "0")  # f32 compute path for speed
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

NGSOLVE_BASELINE_ELTS_PER_SEC = 2.0e4  # estimate, no published number exists
CG_ITERS = 50
SCAN_K = 8
# TPU v5e single-chip peaks (public spec / jax-ml scaling book)
V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_SEC = 819e9


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


def _build(dtype, nx, block=None, mixed=False):
    from ngsxfem_tpu.models.poisson import UnfittedPoisson
    from ngsxfem_tpu.solvers.krylov import cg

    model = UnfittedPoisson(nx=nx, dim=3, order=1, dtype=dtype)
    vals = model.lset_np[model.mesh.elements_np]
    ncut_host = int((((vals < 0).any(1)) & ((vals > 0).any(1))).sum())
    cap = int(ncut_host * 1.2) + 8
    struct = model.ell_structure()  # host numpy tables
    # big index tables enter as ARGUMENTS (baked literals exceed the remote
    # compiler's request limit, HTTP 413)
    K = struct["K"]
    sd = {k: jnp.asarray(v) for k, v in struct.items() if k != "K"}

    def assemble_fn(vertices, lset, st):
        return model.assemble_ell_vals(vertices, lset, cap, dict(st, K=K),
                                       block=block, mixed=mixed)

    def solve_fn(ell_vals, cols, b):
        rows_idx = jnp.arange(cols.shape[0])[:, None]
        diag = jnp.sum(jnp.where(cols == rows_idx, ell_vals, 0.0), axis=1)
        dinv = jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 1.0)
        mv = lambda x: jnp.sum(ell_vals * x[cols], axis=1)
        x, k, res = cg(mv, b, maxiter=CG_ITERS, tol=0.0, M=lambda r: dinv * r)
        return x, res

    def pipeline_fn(vertices, lset, st, b):
        ell_vals, n = assemble_fn(vertices, lset, st)
        x, res = solve_fn(ell_vals, st["ell_cols"], b)
        return x, res, n

    def pipeline_k_fn(vertices, lset, st, b):
        """K chained pipeline iterations with a carried data dependency."""
        nv = lset.shape[0]

        def body(lset_c, _):
            x, res, n = pipeline_fn(vertices, lset_c, st, b)
            # 1e-30-scaled feedback: numerically nil, not foldable by XLA
            lset_next = lset_c + jnp.asarray(1e-30, dtype=lset_c.dtype) * x[:nv]
            return lset_next, res

        lset_f, ress = jax.lax.scan(body, lset, None, length=SCAN_K)
        return lset_f, ress

    b = jnp.where(jnp.asarray(model.active_dofs), 1.0, 0.0).astype(dtype)
    return model, cap, struct, sd, K, assemble_fn, solve_fn, pipeline_fn, \
        pipeline_k_fn, b


def bench_pipeline(dtype, nx, reps, block=None, scan=True, mixed=False):
    (model, cap, struct, sd, K, assemble_fn, solve_fn, pipeline_fn,
     pipeline_k_fn, b) = _build(dtype, nx, block=block, mixed=mixed)
    assemble = jax.jit(assemble_fn)
    solve = jax.jit(solve_fn)
    pipeline = jax.jit(pipeline_fn)
    v, l = model.vertices, model.lset

    ell_vals, n_dev = assemble(v, l, sd)
    jax.block_until_ready(ell_vals)
    assert int(n_dev) <= cap, "cut capacity overflow"

    t_asm, _ = _time(assemble, v, l, sd, reps=reps)
    t_slv, (xs, res) = _time(solve, ell_vals, sd["ell_cols"], b, reps=reps)
    t_pipe, (_, res_p, _) = _time(pipeline, v, l, sd, b, reps=reps)

    r0 = float(jnp.linalg.norm(b))
    assert float(res_p) < 0.1 * r0, (float(res_p), r0)

    out = {
        "ne": model.mesh.ne,
        "ndof": model.ndof,
        "asm_elts_per_sec": model.mesh.ne / t_asm,
        "solve_iters_per_sec": CG_ITERS / t_slv,
        "pipe_elts_per_sec": model.mesh.ne / t_pipe,
        "cg_rel_residual": float(res_p) / r0,
        "t_pipe": t_pipe,
    }
    if scan:
        pipeline_k = jax.jit(pipeline_k_fn)
        t_k, (_, ress) = _time(pipeline_k, v, l, sd, b,
                               reps=max(2, reps - 1))
        assert float(ress[-1]) < 0.1 * r0
        out["t_pipe_k"] = t_k
        out["scan_k"] = SCAN_K
        out["amortized_pipe_elts_per_sec"] = model.mesh.ne * SCAN_K / t_k
    return out


def bench_mg_solve(dtype, nx, reps):
    """Converged solves at nx (rel res <= 1e-8): MG-CG vs Jacobi-CG.

    Every program here traces at HIGHEST matmul precision: the TPU-default
    bf16 einsum passes leave ~3e-3 noise in the level matrices, which
    degrades the geometric-MG contraction rate from ~0.2 to ~0.8 (the
    levels become mutually inconsistent).  The level assembly is
    block-streamed because full-f32 precision materializes the padded
    einsum operands (docs/PERFORMANCE.md "f32 numerical integrity")."""
    from ngsxfem_tpu.models.poisson import UnfittedPoisson
    from ngsxfem_tpu.solvers.mg import FunctionalELLMG, prolongation_coo_np
    from ngsxfem_tpu.solvers.krylov import cg

    jax.config.update("jax_default_matmul_precision", "highest")

    def level(nxl):
        m = UnfittedPoisson(nx=nxl, dim=3, order=1, dtype=dtype)
        vals_el = m.lset_np[m.mesh.elements_np]
        cut = (vals_el < 0).any(1) & (vals_el > 0).any(1)
        ncut = int(cut.sum())
        st = m.ell_structure()
        sd = {k: jnp.asarray(v) for k, v in st.items() if k != "K"}
        vals, _ = jax.jit(
            lambda v, l, s: m.assemble_ell_vals(v, l, ncut + 8,
                                                dict(s, K=st["K"]),
                                                block=16384)
        )(m.vertices, m.lset, sd)
        ifm = np.zeros(m.ndof, bool)
        ifm[m.space.el2dof_np[cut].ravel()] = True
        return m, st, vals, ifm & m.active_dofs

    nxs = [max(nx // 4, 4), max(nx // 2, 8), nx]
    levels = [level(n) for n in nxs]
    models = [lv[0] for lv in levels]
    mg = FunctionalELLMG(
        [lv[1]["ell_cols"] for lv in levels],
        [prolongation_coo_np(models[i].space, models[i + 1].space)
         for i in range(len(levels) - 1)],
        if_masks=[None] + [lv[3] for lv in levels[1:]], if_iters=10,
        active_masks=[m.active_dofs for m in models])
    params = mg.params([lv[2] for lv in levels], dtype=dtype)
    mf, stf, vf, _ = levels[-1]
    b = jnp.where(jnp.asarray(mf.active_dofs), 1.0, 0.0).astype(dtype)
    cols_f = jnp.asarray(stf["ell_cols"])
    TOL = 1e-8

    # coarse factorization on the host in f64 and applied as an explicit
    # inverse at Precision.HIGHEST (solvers/mg.py prepare_host); the library
    # globally pins f32 matmul precision to "highest" (ngsxfem_tpu/config.py)
    # after bf16-pass contamination of on-chip f32 assembly was measured.
    t0p = time.perf_counter()
    pp = mg.prepare_host(params)
    t_prep = time.perf_counter() - t0p

    @jax.jit
    def mg_solve(pp, vf, b):
        mv = lambda x: jnp.sum(vf * x[cols_f], axis=1)
        return cg(mv, b, M=lambda r: mg.apply(pp, r), maxiter=100,
                  tol=TOL)

    @jax.jit
    def jac_solve(vf, b):
        rid = jnp.arange(cols_f.shape[0])[:, None]
        diag = jnp.sum(jnp.where(cols_f == rid, vf, 0.0), axis=1)
        dinv = jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 1.0)
        mv = lambda x: jnp.sum(vf * x[cols_f], axis=1)
        return cg(mv, b, M=lambda r: dinv * r, maxiter=1500, tol=TOL)

    bn = float(jnp.linalg.norm(b))
    try:
        t_mg, (x_mg, k_mg, res_mg) = _time(mg_solve, pp, vf, b, reps=reps)
        t_j, (x_j, k_j, res_j) = _time(jac_solve, vf, b, reps=reps)
    finally:
        jax.config.update("jax_default_matmul_precision", None)
    # the bench ASSERTS the tolerance for the MG solve (a converged solve,
    # not a fixed budget); Jacobi-CG is the comparison point and is reported
    # with whatever it achieved within its 3000-iteration cap
    assert float(res_mg) <= TOL * bn * 1.5, (float(res_mg), bn)
    jac_converged = float(res_j) <= TOL * bn * 1.5
    if jac_converged:
        # solution agreement bounded by cond(A)*tol ~ 1e5 * 1e-8
        assert float(jnp.linalg.norm(x_mg - x_j)) < 1e-2 * float(
            jnp.linalg.norm(x_j))
    return {
        "mg_solve_seconds": t_mg,
        "mg_prepare_seconds": t_prep,
        "mg_iters": int(k_mg),
        "mg_rel_res": float(res_mg) / bn,
        "jacobi_solve_seconds": t_j,
        "jacobi_iters": int(k_j),
        "jacobi_rel_res": float(res_j) / bn,
        "jacobi_converged": jac_converged,
        "solve_tol": TOL,
    }


def main():
    nx = int(os.environ.get("BENCH_NX", "48"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    if os.environ.get("BENCH_INNER_F64") == "1":
        # f64 at benchmark scale.  TPU f64 is software-emulated AND XLA
        # materializes the cut-tier dshape tensors tile-padded ((nd,d) ->
        # (8,128), ~85x) in f64 — a 2048-element block bounds each temp to
        # ~1.2 GB where one 65536 block would need 38 GB (measured; see
        # docs/PERFORMANCE.md).  Mixed precision keeps cut-rule geometry and
        # CG in f64 but runs the B.D.B^T einsums in f32.
        jax.config.update("jax_enable_x64", True)
        _ = float(jnp.sum(jnp.ones((8, 8))))  # sync regime
        nx64 = int(os.environ.get("BENCH_F64_NX", str(max(nx * 2 // 3, 32))))
        out = {"f64_nx": nx64}
        try:
            r64 = bench_pipeline(jnp.float64, nx64, max(2, reps), block=2048,
                                 scan=False)
            out.update(f64_pipe=r64["pipe_elts_per_sec"],
                       f64_asm=r64["asm_elts_per_sec"], f64_ne=r64["ne"])
        except Exception as e:
            out["f64_error"] = f"{type(e).__name__}: {e}"[:200]
        # timed mixed-precision run measured once (r3): 59.7k elts/s pipe at
        # nx=32 — indistinguishable from full f64 (f64 emulation dominates
        # geometry too), so only the achieved-precision measure is kept
        if os.environ.get("BENCH_F64_MIXED") == "1":
            try:
                rmx = bench_pipeline(jnp.float64, nx64, max(2, reps),
                                     block=4096, scan=False, mixed=True)
                out.update(f64_mixed_pipe=rmx["pipe_elts_per_sec"],
                           f64_mixed_asm=rmx["asm_elts_per_sec"])
            except Exception as e:
                out["f64_mixed_error"] = f"{type(e).__name__}: {e}"[:200]
        # achieved mixed-precision element-matrix error vs full f64
        # (size-independent relative measure, computed at nx=16)
        try:
            bf = _build(jnp.float64, 16)
            bm = _build(jnp.float64, 16, mixed=True)
            vf, _ = jax.jit(bf[5])(bf[0].vertices, bf[0].lset, bf[3])
            vm, _ = jax.jit(bm[5])(bm[0].vertices, bm[0].lset, bm[3])
            out["mixed_rel_err"] = float(
                jnp.max(jnp.abs(vf - vm)) / jnp.max(jnp.abs(vf)))
        except Exception as e:
            out["mixed_err_error"] = f"{type(e).__name__}: {e}"[:200]
        print(json.dumps(out))
        return

    if os.environ.get("BENCH_INNER_CPUPIPE") == "1":
        # same XLA programs on the host CPU: a MEASURED hardware comparison
        # point next to the (unmeasurable, estimated) NGSolve baseline.
        # JAX_PLATFORMS=cpu is set by the spawning process (an in-process
        # platform switch cannot displace a registered TPU plugin).
        assert jax.devices()[0].platform == "cpu", "cpu inner not on cpu"
        r = bench_pipeline(jnp.float32, nx, 2, scan=False)
        print(json.dumps({
            "cpu_pipe_elts_per_sec": r["pipe_elts_per_sec"],
            "cpu_asm_elts_per_sec": r["asm_elts_per_sec"],
        }))
        return

    if os.environ.get("BENCH_INNER_COST") == "1":
        # XLA cost model of the EXACT pipeline program, from the same
        # backend/compiler the timed run used (TPU executable when available)
        (model, cap, struct, sd, K, assemble_fn, solve_fn, pipeline_fn,
         pipeline_k_fn, b) = _build(jnp.float32, nx)
        out = {}
        for name, fn, args in (
            ("assemble", assemble_fn, (model.vertices, model.lset, sd)),
            ("pipeline", pipeline_fn, (model.vertices, model.lset, sd, b)),
        ):
            c = jax.jit(fn).lower(*args).compile().cost_analysis()
            if isinstance(c, list):
                c = c[0]
            out[name] = {"flops": float(c.get("flops", -1)),
                         "bytes": float(c.get("bytes accessed", -1))}
        print(json.dumps(out))
        return

    # enter the synchronous (observable-completion) regime BEFORE timing
    _ = float(jnp.sum(jnp.ones((8, 8))))

    # wall-clock budget: optional stages are skipped (and say so) rather
    # than blowing the driver's window — compile times through the remote
    # compiler dominate and vary
    budget = float(os.environ.get("BENCH_BUDGET_SECONDS", "2700"))
    t_start = time.perf_counter()

    def budget_left():
        return budget - (time.perf_counter() - t_start)

    r32 = bench_pipeline(jnp.float32, nx, reps)
    mg = None
    if os.environ.get("BENCH_MG", "1") != "0":
        if budget_left() < 600:
            mg = {"skipped": "bench budget exhausted"}
        else:
            try:
                mg = bench_mg_solve(jnp.float32, nx, 1)
            except Exception as e:
                mg = {"error": f"{type(e).__name__}: {e}"[:300]}

    def _sub(env_key, timeout, extra_env=None):
        try:
            env = dict(os.environ, **{env_key: "1"}, **(extra_env or {}))
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, timeout=timeout)
            return json.loads(out.stdout.strip().splitlines()[-1])
        except Exception:
            return None

    # CPU-backend inners: the platform MUST be pinned via the environment
    # BEFORE the subprocess imports jax — an in-process
    # jax.config.update("jax_platforms") does not displace an
    # already-registered TPU plugin
    _cpu_env = {"JAX_PLATFORMS": "cpu"}
    # cost first (cheap + compile-cached: feeds the MFU/roofline estimate),
    # then the expensive f64, then the CPU comparison point
    cost = _sub("BENCH_INNER_COST", max(300, budget_left())) \
        if os.environ.get("BENCH_COST", "1") != "0" else None
    f64 = (_sub("BENCH_INNER_F64", max(300, budget_left()))
           if os.environ.get("BENCH_F64", "1") != "0"
           and budget_left() > 600 else None)
    cpu = (_sub("BENCH_INNER_CPUPIPE", max(300, budget_left()), _cpu_env)
           if os.environ.get("BENCH_CPU", "1") != "0"
           and budget_left() > 300 else None)

    # MFU / roofline from the amortized in-program time (regime 2+3 above)
    mfu = None
    roofline = None
    if cost and "t_pipe_k" in r32:
        t_iter = r32["t_pipe_k"] / SCAN_K
        fl = cost["pipeline"]["flops"]
        by = cost["pipeline"]["bytes"]
        if fl > 0:
            mfu = fl / t_iter / V5E_PEAK_BF16_FLOPS
            roofline = {
                "flops_per_iter": fl,
                "hbm_bytes_per_iter": by,
                "arithmetic_intensity": fl / by if by > 0 else None,
                "hbm_speed_of_light_seconds": by / V5E_HBM_BYTES_PER_SEC,
                "hbm_roofline_fraction": (by / V5E_HBM_BYTES_PER_SEC) / t_iter
                if by > 0 else None,
                "amortized_iter_seconds": t_iter,
            }

    out = {
        "metric": "3d_fictdom_pipeline_throughput",
        "value": round(r32.get("amortized_pipe_elts_per_sec",
                               r32["pipe_elts_per_sec"]), 1),
        "unit": "elements/sec",
        "vs_baseline": round(
            r32.get("amortized_pipe_elts_per_sec", r32["pipe_elts_per_sec"])
            / NGSOLVE_BASELINE_ELTS_PER_SEC, 2),
        "baseline_note": "2e4 elts/s NGSolve figure is an unmeasured estimate",
        "timing_note": (
            "value = amortized K-iteration in-program rate (lax.scan over "
            f"{SCAN_K} chained pipeline iterations with a carried data "
            "dependency, synchronous completed-execution regime); per-call "
            "rates below include per-launch tunnel overhead and are lower "
            "bounds"),
        "percall_pipe_elts_per_sec": round(r32["pipe_elts_per_sec"], 1),
        "assembly_elts_per_sec": round(r32["asm_elts_per_sec"], 1),
        "solve_iters_per_sec": round(r32["solve_iters_per_sec"], 1),
        "cg_iters": CG_ITERS,
        "mg_converged_solve": mg,
        "f64": f64,
        "cpu_xla_measured": cpu,
        "mfu_estimate": round(mfu, 5) if mfu else None,
        "roofline": roofline,
        "ne": r32["ne"],
        "ndof": r32["ndof"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
