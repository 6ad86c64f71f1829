"""Benchmark: 3D fictitious-domain Poisson — FULL pipeline on one TPU chip.

The BASELINE.json headline config (reference workload
``py_tutorials/fictdom_ghostpen.py``): level-set classification, cut
geometry, cut stiffness + Nitsche + facet-patch ghost penalty, global
operator build, and the solve.

FAST PATH (round 3): the pipeline is fully lattice-native —
  * closed-form P1 cut element values (models/poisson.cut_poisson_flat_soa):
    no quadrature tensors, every array (E,)-shaped (TPU tile-padding-free);
  * gather-free AND scatter-free global assembly: corner data are shifted
    lattice slices, contributions are windowed lattice adds into an
    offset-diagonal (DIA) operator table (assemble_vals_lattice);
  * gather-free SpMV: 27 static shifted slices (solvers/sparse.dia_matvec),
    0.22 ms per PCG iteration at 117k dofs (the ELL gather path serialized
    at 24.5 ms/iter);
  * converged solve by mixed-precision iterative refinement
    (solvers/krylov.cg_ir): f32 inner PCG + 4 emulated-f64 outer residuals,
    TRUE f64 relative residual < 1e-10 ASSERTED.

Baseline constant: single-node NGSolve/ngsxfem assembles roughly 2e4 cut
3D P1 elements/sec/core (cut-rule construction dominated).  This is an
ESTIMATE — the reference publishes no benchmark numbers and NGSolve is not
installable in this environment (see BASELINE.md); the JSON labels it so.
vs_baseline = pipeline elements/sec / 2e4; the driver target is >= 20.

MEASUREMENT REGIMES (tunneled runtime, see docs/PERFORMANCE.md):
1. SYNCHRONOUS per-call: on the axon tunnel execution is LAZY — only the
   synchronous regime (entered by the first device->host read) observes
   completed work.  Per-call rates include per-launch tunnel overhead and
   are lower bounds.
2. AMORTIZED K-iteration: K full pipeline iterations run INSIDE one jitted
   lax.scan with a carried data dependency (each iteration perturbs the
   level set by the previous solution scaled to FEEDBACK_SCALE=1e-6 —
   representable in f32, so the iterations are numerically distinct and
   neither DCE nor reordering can fold them).  time/K approaches the
   on-chip per-iteration cost.
3. MFU/ROOFLINE ESTIMATE: FLOP and HBM-byte counts of the exact pipeline
   HLO from XLA's own cost model (.cost_analysis() of the identical
   program), divided by the amortized time:
   mfu_estimate = flops/t_amortized / 197e12 (TPU v5e bf16 peak);
   hbm_roofline_fraction = (bytes/819e9) / t_amortized (1.0 = the program
   runs exactly at v5e HBM speed of light).

Prints ONE JSON line.
"""
import atexit
import os
import signal
import sys
import time
import json
import threading
import subprocess

os.environ.setdefault("NGSXFEM_TPU_X64", "0")  # f32 compute path for speed
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

# x64 enables the f64 OUTER residuals of iterative refinement and the
# native-f64 assembly stage; the f32 fast path is explicitly typed
jax.config.update("jax_enable_x64", True)

# honor JAX_PLATFORMS for the CPU subprocess stages: the site-installed
# axon PJRT plugin pre-imports jax and outranks the env var, so it must be
# re-applied after import and BEFORE the first jax.devices() (same dance as
# tests/conftest.py; ngsxfem_tpu.config does it too, but the inner stages
# touch jax before importing the package)
if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

NGSOLVE_BASELINE_ELTS_PER_SEC = 2.0e4  # estimate, no published number exists
CG_ITERS = 50          # fixed-budget PCG stage (round-2-comparable metric)
SCAN_K = 8
IR_OUTER, IR_INNER = 4, 120
SOLVE_TOL = 1e-10      # asserted on the TRUE f64 residual of the IR solve
# TPU v5e single-chip peaks (public spec / jax-ml scaling book)
V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_SEC = 819e9
# amortized-scan feedback scale: REPRESENTABLE in f32 (round-3 review: 1e-30
# rounds to zero against O(1) level-set values, making the 8 iterations
# numerically identical; 1e-6 keeps them distinct while leaving the measured
# workload unchanged — the data dependency is now numerical, not just
# structural)
SCAN_FEEDBACK = 1e-6


def _hb(msg):
    """Stage heartbeat on stderr (the tunneled TPU can wedge mid-run —
    memory/axon pathologies #5 — and a silent hang is undiagnosable)."""
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()
_PARTIAL = {}           # filled stage by stage; every emission snapshots it
_CHILDREN = []          # subprocess.Popen handles killed at exit/TERM
_EMIT_LOCK = threading.Lock()
_PARTIAL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_partial.json")


def _emit(note=None):
    """Print the CURRENT _PARTIAL as one full JSON line (the driver parses
    the LAST line of stdout, so re-emitting an enriched record after every
    measurement is strictly better than a single end-of-run print — the
    round-4 run measured its full headline by t+196 s and was killed at
    t+780 s with NOTHING printed), and mirror it to bench_partial.json so a
    killed run leaves the stage record in the tree."""
    with _EMIT_LOCK:
        out = dict(_PARTIAL)
        out.setdefault("metric", "3d_fictdom_pipeline_throughput")
        out.setdefault("value", 0.0)
        out.setdefault("unit", "elements/sec")
        out.setdefault("vs_baseline", 0.0)
        if note:
            out["incomplete"] = note
        out["elapsed_seconds"] = round(time.perf_counter() - _T0, 1)
        line = json.dumps(out)
        print(line, flush=True)
        try:
            tmp = _PARTIAL_PATH + ".tmp"
            with open(tmp, "w") as f:
                f.write(line + "\n")
            os.replace(tmp, _PARTIAL_PATH)
        except OSError:
            pass
        return out


def _kill_children():
    for p in _CHILDREN:
        try:
            if p.poll() is None:
                p.kill()
        except Exception:
            pass


def _install_term_handler():
    """`timeout`-style kills send SIGTERM before SIGKILL; dump the partial
    record and exit instead of dying silently (the round-4 failure mode)."""
    def h(signum, frame):
        _emit(note=f"killed by signal {signum} at "
                   f"t+{time.perf_counter() - _T0:.0f}s; values are from "
                   "completed stages")
        _kill_children()
        os._exit(0)

    for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP):
        try:
            signal.signal(sig, h)
        except (ValueError, OSError):
            pass


def _start_watchdog(deadline_seconds):
    """If the process is still alive past the deadline (a wedged tunnel
    blocks in C and is neither interruptible nor raisable — not even by
    SIGTERM's Python-level handler), print ONE JSON line from whatever
    stages completed and hard-exit — the driver must always receive a
    record."""
    def w():
        time.sleep(deadline_seconds)
        _emit(note=f"watchdog: stage hung past {deadline_seconds:.0f}s "
                   "hard deadline (tunneled TPU runtime wedge); values are "
                   "from completed stages")
        _kill_children()
        os._exit(0)

    t = threading.Thread(target=w, daemon=True)
    t.start()


def _time(fn, *args, reps=3):
    """Synchronous per-call timing; median of `reps` calls."""
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


def _build_fast(dtype, nx):
    """Flagship fast path: stencil assembly -> DIA operator -> DIA solvers.

    Returns (model, funcs dict, b).  All solver vectors live in the
    vertex-lexicographic (DIA) numbering; `perm` maps back to dof order.
    """
    from ngsxfem_tpu.models.poisson import UnfittedPoisson
    from ngsxfem_tpu.solvers.sparse import dia_matvec
    from ngsxfem_tpu.solvers.krylov import cg, cg_ir, jacobi_preconditioner

    model = UnfittedPoisson(nx=nx, dim=3, order=1, dtype=dtype)
    dst = model.dia_structure()
    offs = dst["offsets"]
    k0 = int(np.searchsorted(offs, 0))
    # slot tables enter as device ARGUMENTS (threaded through the jitted
    # signatures below): closure-captured device arrays force a D2H read at
    # trace time on the tunnel, and baked literals of this size exceed the
    # remote compiler's request limit
    dd_static = {k: v for k, v in dst.items() if "slots" not in k}
    dd = {k: jnp.asarray(v) for k, v in dst.items() if "slots" in k}

    def assemble_fn(vertices, lset, dd):
        return model.assemble_vals_lattice(vertices, lset,
                                           {**dd_static, **dd})

    def pcg_fn(V, b, iters=CG_ITERS):
        dinv = jnp.where(jnp.abs(V[k0]) > 1e-30, 1.0 / V[k0], 1.0)
        mv = lambda x: dia_matvec(offs, V, x)
        x, _, res = cg(mv, b, M=lambda r: dinv * r, maxiter=iters, tol=0.0)
        return x, res

    def pipeline_fn(vertices, lset, b, dd):
        V, n = assemble_fn(vertices, lset, dd)
        x, res = pcg_fn(V, b)
        return x, res, n

    def pipeline_k_fn(vertices, lset, b, dd):
        def body(lset_c, _):
            x, res, n = pipeline_fn(vertices, lset_c, b, dd)
            # representable feedback: each iteration sees a (numerically)
            # different level set, so the chain cannot be folded OR
            # deduplicated; 1e-6 * O(1) solution values perturb the lset by
            # ~1e-6 h — workload-identical, value-distinct
            lset_next = lset_c + jnp.asarray(SCAN_FEEDBACK, lset_c.dtype) * \
                x[:lset_c.shape[0]].astype(lset_c.dtype)
            return lset_next, res
        lset_f, ress = jax.lax.scan(body, lset, None, length=SCAN_K)
        return lset_f, ress

    def ir_solve_fn(V, b):
        V64 = V.astype(jnp.float64)
        V32 = V.astype(jnp.float32)
        dinv = jnp.where(jnp.abs(V32[k0]) > 1e-30, 1.0 / V32[k0], 1.0)
        return cg_ir(lambda x: dia_matvec(offs, V32, x),
                     lambda x: dia_matvec(offs, V64, x),
                     b.astype(jnp.float32), M=lambda r: dinv * r,
                     outer=IR_OUTER, inner=IR_INNER)

    def f64cg_fn(V, b):
        """Native-f64 Jacobi-PCG to SOLVE_TOL — fallback converged solve for
        the f64 stage when the mixed-precision IR path stalls on-chip."""
        V64 = V.astype(jnp.float64)
        dinv = jnp.where(jnp.abs(V64[k0]) > 1e-30, 1.0 / V64[k0], 1.0)
        b64 = b.astype(jnp.float64)
        return cg(lambda x: dia_matvec(offs, V64, x), b64,
                  M=lambda r: dinv * r, maxiter=1200, tol=SOLVE_TOL)

    b_np = np.where(model.active_dofs[dst["perm_inv"]], 1.0, 0.0)
    b = jnp.asarray(b_np, dtype=dtype)
    funcs = dict(assemble=assemble_fn, pcg=pcg_fn, pipeline=pipeline_fn,
                 pipeline_k=pipeline_k_fn, ir=ir_solve_fn, f64cg=f64cg_fn)
    return model, funcs, b, dd, {"offs": offs, "k0": k0}


def bench_pipeline(dtype, nx, reps, scan=True, ir=True, ir_assert=True,
                   pipe=True, publish=None, prebuilt=None):
    """Fast-path pipeline stage, CHEAPEST-VERIFIED-FIRST: assemble ->
    fixed-budget PCG -> fused per-call pipeline (headline-capable within
    minutes) -> amortized scan -> IR converged solve.  ``publish(out)`` is
    called after EVERY measurement so a mid-stage tunnel wedge still leaves
    the completed numbers in the partial record."""
    pub = publish or (lambda o: None)
    # the amortized scan contains the fused pipeline program; running it
    # without the per-call fused stage would still pay the fused compile,
    # which is exactly what pipe=False exists to avoid (the f64 stage)
    assert not (scan and not pipe), "scan=True requires pipe=True"
    _hb(f"pipeline stage: build nx={nx} {jnp.dtype(dtype).name}")
    if prebuilt is not None:
        model, F, b, dd, meta = prebuilt
    else:
        model, F, b, dd, meta = _build_fast(dtype, nx)
    assemble = jax.jit(F["assemble"])
    pipeline = jax.jit(F["pipeline"])
    v, l = model.vertices, model.lset
    out = {"ne": model.mesh.ne, "ndof": model.ndof}

    _hb("pipeline stage: compile+first assemble")
    V, n_dev = assemble(v, l, dd)
    jax.block_until_ready(V)

    _hb("pipeline stage: timing assemble")
    t_asm, _ = _time(assemble, v, l, dd, reps=reps)
    out["asm_elts_per_sec"] = model.mesh.ne / t_asm
    pub(out)
    _hb("pipeline stage: timing pcg")
    t_slv, (xs, res) = _time(jax.jit(F["pcg"]), V, b, reps=reps)
    out["solve_iters_per_sec"] = CG_ITERS / t_slv
    # plain-PCG residual: named distinctly from the fused-pipeline
    # cg50_rel_residual so the two metrics are never conflated
    out["pcg50_rel_residual"] = float(res) / (float(jnp.linalg.norm(b))
                                              or 1.0)
    out["_ctx"] = dict(model=model, V=V, b=b, xs=xs, res=res,
                       offs=meta["offs"], k0=meta["k0"],
                       solve_iters_per_sec=CG_ITERS / t_slv)
    pub(out)
    r0 = float(jnp.linalg.norm(b))
    if pipe:
        # the fused pipeline re-traces ASSEMBLY inside the solver program —
        # in f64 that is a second ~950 s remote compile (measured
        # 2026-08-20), which is why the f64 stage passes pipe=False and
        # reports assemble + solver rates only
        _hb("pipeline stage: timing fused pipeline")
        t_pipe, (_, res_p, _) = _time(pipeline, v, l, b, dd, reps=reps)
        out.update({
            "pipe_elts_per_sec": model.mesh.ne / t_pipe,
            "cg50_rel_residual": float(res_p) / r0,
            "t_pipe": t_pipe,
        })
        pub(out)
    if scan and pipe:
        # amortized scan directly after the per-call number: the two
        # headline rates land before the (slower) converged-solve stages
        _hb(f"pipeline stage: timing amortized scan K={SCAN_K}")
        pipeline_k = jax.jit(F["pipeline_k"])
        t_k, (_, ress) = _time(pipeline_k, v, l, b, dd,
                               reps=max(2, reps - 1))
        out["t_pipe_k"] = t_k
        out["scan_k"] = SCAN_K
        out["amortized_pipe_elts_per_sec"] = model.mesh.ne * SCAN_K / t_k
        pub(out)
    if ir:
        _hb("pipeline stage: timing IR converged solve")
        t_ir, (x64, res64) = _time(jax.jit(F["ir"]), V, b, reps=reps)
        rel = float(res64) / r0
        # converged solve: TRUE f64 residual, asserted on the f32 stage.
        # cg_ir is SAFEGUARDED (monotone, finite: corrections that increase
        # the true f64 residual are rejected), so a diverging inner f32 CG
        # can only stall it — in which case the f64 stage falls back to a
        # native-f64 PCG below so the converged metric is always real.
        if ir_assert:
            assert rel <= SOLVE_TOL, f"IR solve missed tolerance: {rel}"
        out["ir_solve_seconds"] = t_ir
        out["ir_true_rel_residual"] = rel
        out["converged_pipe_elts_per_sec"] = model.mesh.ne / (t_asm + t_ir)
        pub(out)
        if not ir_assert and rel > SOLVE_TOL:
            _hb("pipeline stage: IR stalled -> native-f64 PCG fallback")
            t_cg, (_, k64, res_cg) = _time(jax.jit(F["f64cg"]), V, b,
                                           reps=max(2, reps - 1))
            out["f64cg_solve_seconds"] = t_cg
            out["f64cg_iters"] = int(k64)
            out["f64cg_rel_residual"] = float(res_cg) / r0
            out["converged_pipe_elts_per_sec"] = \
                model.mesh.ne / (t_asm + t_cg)
            pub(out)
    return out


def bench_f64_stage(nx, reps, budget_left=None, publish=None):
    """Native-f64 assembly + solvers at benchmark scale (the SoA/stencil
    pipeline has no tile-padded tensors, so full-f64 assembly runs at
    nx=48) + the mixed-precision IR converged solve with its TRUE f64
    residual; falls back to a native-f64 PCG when IR stalls
    (ir_assert=False).  pipe=False: the fused assemble+solve program would
    re-trace assembly into a SECOND ~950 s f64 remote compile for no new
    information — the separate rates cover the claim.  ``budget_left``
    (the stage budget) gates the IR/converged stage so a short budget still
    yields the assembly + PCG rates; ``publish`` receives partial fields as
    they are measured (f64_-prefixed) for the stage watchdog dump."""
    pub = publish or (lambda o: None)

    def _pub(r):
        pref = {}
        for src, dst in (("ne", "f64_ne"),
                         ("asm_elts_per_sec", "f64_asm_elts_per_sec"),
                         ("pcg50_rel_residual", "f64_pcg50_rel_residual"),
                         ("converged_pipe_elts_per_sec",
                          "f64_converged_pipe_elts_per_sec"),
                         ("ir_true_rel_residual",
                          "f64_ir_true_rel_residual")):
            if src in r:
                pref[dst] = r[src]
        pref["f64_nx"] = nx
        pub(pref)

    do_ir = True if budget_left is None else budget_left() > 240
    r64 = bench_pipeline(jnp.float64, nx, max(2, reps - 1),
                         scan=False, ir=do_ir, ir_assert=False, pipe=False,
                         publish=_pub)
    r64.pop("_ctx", None)
    out = {
        "f64_nx": nx,
        "f64_ne": r64["ne"],
        "f64_asm_elts_per_sec": r64["asm_elts_per_sec"],
        "f64_pcg50_rel_residual": r64["pcg50_rel_residual"],
        "f64_converged_pipe_elts_per_sec":
            r64.get("converged_pipe_elts_per_sec"),
        "f64_ir_true_rel_residual": r64.get("ir_true_rel_residual"),
    }
    if not do_ir:
        out["f64_ir_skipped"] = "stage budget too low for the IR stage"
    for k in ("f64cg_solve_seconds", "f64cg_iters", "f64cg_rel_residual"):
        if k in r64:
            out[k] = r64[k]
    return out


def bench_mg_solve(dtype, nx, reps):
    """Converged-solve comparison stage: LATTICE DIA cut-MG-preconditioned
    CG — one jitted program, gather-free V-cycle, DEVICE-RESIDENT coarse
    dense inverse (round-3 review: the ELL gather V-cycle + 7.7 s host
    coarse factorization could not win end-to-end; solvers/latticemg.py is
    the redesign) — timed against Jacobi-CG to the SAME tolerance so the
    crossover is measured, not argued."""
    from ngsxfem_tpu.config import config as _cfg
    from ngsxfem_tpu.models.poisson import UnfittedPoisson
    from ngsxfem_tpu.solvers.krylov import cg
    from ngsxfem_tpu.solvers.latticemg import LatticeDIAMG
    from ngsxfem_tpu.solvers.sparse import dia_matvec

    def level(nxl):
        m = UnfittedPoisson(nx=nxl, dim=3, order=1, dtype=dtype)
        d = m.dia_structure()
        dd_static = {k: v for k, v in d.items() if "slots" not in k}
        dd = {k: jnp.asarray(v) for k, v in d.items() if "slots" in k}
        V, _ = jax.jit(lambda v, l, s: m.assemble_vals_lattice(
            v, l, {**dd_static, **s}))(m.vertices, m.lset, dd)
        act = m.active_dofs[d["perm_inv"]]
        ge = m.lset_np[m.mesh.elements_np]
        ge = np.where(np.abs(ge) < _cfg.lset_eps,
                      np.where(ge >= 0, _cfg.lset_eps, -_cfg.lset_eps), ge)
        cut = (ge < 0).any(1) & (ge > 0).any(1)
        ifd = np.zeros(m.ndof, bool)
        ifd[m.space.el2dof_np[cut].ravel()] = True
        return m, d["offsets"], V, act, (ifd & m.active_dofs)[d["perm_inv"]]

    nxs = [nx]  # coarsen while the lattices nest (2*nc-1 fine vertices)
    while nxs[0] % 2 == 0 and nxs[0] // 2 >= 3 and len(nxs) < 3:
        nxs.insert(0, nxs[0] // 2)
    levels = [level(n) for n in nxs]
    offs_f = levels[-1][1]
    mg = LatticeDIAMG([lv[1] for lv in levels], [n + 1 for n in nxs],
                      dim=3, active_masks=[lv[3] for lv in levels],
                      if_masks=[None] + [lv[4] for lv in levels[1:]])
    params = mg.params([lv[2] for lv in levels], dtype=dtype)
    Vf = levels[-1][2]
    b = jnp.asarray(np.where(levels[-1][3], 1.0, 0.0), dtype=dtype)
    TOL = 1e-8

    prep = jax.jit(mg.prepare)
    pp = prep(params)  # compile
    jax.block_until_ready(pp["ainv0"])
    t_prep, pp = _time(prep, params, reps=max(2, reps))

    mg_solve = jax.jit(lambda pp, b: cg(
        lambda z: dia_matvec(offs_f, pp["vals"][-1], z), b,
        M=lambda r: mg.apply(pp, r), maxiter=100, tol=TOL))
    bn = float(jnp.linalg.norm(b))
    t_mg, (x_mg, k_mg, res_mg) = _time(mg_solve, pp, b, reps=reps)
    assert float(res_mg) <= TOL * bn * 1.5, (float(res_mg), bn)

    # Jacobi-CG to the SAME tolerance on the same operator: the crossover
    k0 = list(np.asarray(offs_f)).index(0)
    dinv = jnp.where(jnp.abs(Vf[k0]) > 1e-30, 1.0 / Vf[k0], 1.0)
    j_solve = jax.jit(lambda V, b: cg(
        lambda z: dia_matvec(offs_f, V, z), b, M=lambda r: dinv * r,
        maxiter=3000, tol=TOL))
    t_j, (x_j, k_j, res_j) = _time(j_solve, Vf, b, reps=max(2, reps - 1))

    return {
        "mg_solve_seconds": t_mg,
        "mg_prepare_seconds": t_prep,
        "mg_iters": int(k_mg),
        "mg_rel_res": float(res_mg) / bn,
        "jacobi_solve_seconds": t_j,
        "jacobi_iters": int(k_j),
        "jacobi_rel_res": float(res_j) / bn,
        "mg_speedup_vs_jacobi": t_j / t_mg,
        "mg_speedup_incl_prepare": t_j / (t_mg + t_prep),
        "solve_tol": TOL,
        "design": "lattice DIA V-cycle, gather-free transfers, device "
                  "coarse inverse (solvers/latticemg.py)",
    }


def bench_pallas_cg(ctx, reps):
    """Fused VMEM-resident Pallas PCG (solvers/pallas_cg.dia_cg_fused) on
    the REAL chip: same operator, same fixed budget as the XLA DIA PCG the
    pipeline stage timed — solutions compared (f32 reduction-order roundoff
    apart), per-iteration time recorded next to the XLA path's.  A Mosaic
    rejection (VMEM cap, roll lowering, SMEM out-spec) is recorded as the
    error string, not raised."""
    from ngsxfem_tpu.solvers.pallas_cg import dia_cg_fused

    model, V, b = ctx["model"], ctx["V"], ctx["b"]
    offs, k0 = ctx["offs"], ctx["k0"]
    plane = (model.nx + 1) ** 2
    dinv = jnp.where(jnp.abs(V[k0]) > 1e-30, 1.0 / V[k0], 1.0)
    fused = jax.jit(lambda V, b, dinv: dia_cg_fused(
        offs, V, b, dinv, CG_ITERS, plane))
    t_f, (xf, rf) = _time(fused, V, b, dinv, reps=reps)
    xr, rr = ctx["xs"], ctx["res"]
    nrm = float(jnp.linalg.norm(xr)) or 1.0
    rel = float(jnp.linalg.norm(xf - xr)) / nrm
    t_xla_iter = (1.0 / ctx["solve_iters_per_sec"]
                  if ctx.get("solve_iters_per_sec") else None)
    # DIFFERENTIAL per-iteration time: at CG_ITERS=50 a single ~20 ms
    # tunnel launch is ~0.4 ms/iter — most of the per-call figure.  Timing
    # the SAME program at 4x the iterations and taking the marginal slope
    # cancels the launch cost for both the fused kernel and the XLA CG,
    # giving the honest on-chip per-iteration comparison.
    from ngsxfem_tpu.solvers.krylov import cg
    from ngsxfem_tpu.solvers.sparse import dia_matvec

    fused4 = jax.jit(lambda V, b, dinv: dia_cg_fused(
        offs, V, b, dinv, 4 * CG_ITERS, plane))
    t_f4, _ = _time(fused4, V, b, dinv, reps=reps)

    def _xla(iters):
        return jax.jit(lambda V, b, dinv: cg(
            lambda x: dia_matvec(offs, V, x), b, M=lambda r: dinv * r,
            maxiter=iters, tol=0.0))

    t_x1, _ = _time(_xla(CG_ITERS), V, b, dinv, reps=reps)
    t_x4, _ = _time(_xla(4 * CG_ITERS), V, b, dinv, reps=reps)
    marg_f = (t_f4 - t_f) / (3 * CG_ITERS)
    marg_x = (t_x4 - t_x1) / (3 * CG_ITERS)

    # VMEM-resident regime: at nx=48 the DIA table (~21 MB) exceeds the
    # 16 MB core VMEM, so the fused kernel cannot beat the HBM-roofline XLA
    # SpMV.  At nx=24 (15.6k dofs, table+vectors ~2 MB) the WHOLE solve is
    # VMEM-resident — the regime the kernel was designed for: zero HBM
    # traffic between iterations, where XLA's while_loop round-trips every
    # vector through HBM.  Measure the marginal per-iteration crossover.
    small = None
    try:
        _hb("pallas stage: VMEM-resident regime (nx=24)")
        sm, sF, sb, sdd, smeta = _build_fast(jnp.float32, 24)
        sV, _ = jax.jit(sF["assemble"])(sm.vertices, sm.lset, sdd)
        soffs, sk0 = smeta["offs"], smeta["k0"]
        sdinv = jnp.where(jnp.abs(sV[sk0]) > 1e-30, 1.0 / sV[sk0], 1.0)
        splane = (sm.nx + 1) ** 2

        def _sf(iters):
            return jax.jit(lambda V, b, d: dia_cg_fused(
                soffs, V, b, d, iters, splane))

        def _sx(iters):
            return jax.jit(lambda V, b, d: cg(
                lambda x: dia_matvec(soffs, V, x), b, M=lambda r: d * r,
                maxiter=iters, tol=0.0))

        ts_f1, (sxf, _) = _time(_sf(CG_ITERS), sV, sb, sdinv, reps=reps)
        ts_f4, _ = _time(_sf(4 * CG_ITERS), sV, sb, sdinv, reps=reps)
        ts_x1, (sxr, _, _) = _time(_sx(CG_ITERS), sV, sb, sdinv, reps=reps)
        ts_x4, _ = _time(_sx(4 * CG_ITERS), sV, sb, sdinv, reps=reps)
        smarg_f = (ts_f4 - ts_f1) / (3 * CG_ITERS)
        smarg_x = (ts_x4 - ts_x1) / (3 * CG_ITERS)
        snrm = float(jnp.linalg.norm(sxr)) or 1.0
        small = {
            "nx": 24, "ndof": int(sb.shape[0]),
            "marginal_per_iter_seconds": smarg_f,
            "xla_marginal_per_iter_seconds": smarg_x,
            "marginal_speedup_vs_xla": (smarg_x / smarg_f
                                        if smarg_f > 0 else None),
            "rel_diff_vs_xla": float(jnp.linalg.norm(sxf - sxr)) / snrm,
        }
    except Exception as e:
        small = {"error": f"{type(e).__name__}: {e}"[:300]}

    return {
        "vmem_resident_small": small,
        "iters": CG_ITERS,
        "seconds": t_f,
        "per_iter_seconds": t_f / CG_ITERS,
        "xla_dia_per_iter_seconds": t_xla_iter,
        "speedup_vs_xla_dia": (t_xla_iter / (t_f / CG_ITERS)
                               if t_xla_iter else None),
        "marginal_per_iter_seconds": marg_f,
        "xla_marginal_per_iter_seconds": marg_x,
        "marginal_speedup_vs_xla": (marg_x / marg_f if marg_f > 0 else None),
        "rel_diff_vs_xla": rel,
        "residual_fused": float(rf),
        "residual_xla": float(rr),
        "agrees_f32": rel < 5e-3,
        "interpret": False,
    }


def bench_high_order(nx, orders, reps, budget_left, publish=None):
    """Order-2/3 3D isoparametric fictitious-domain Poisson — the
    reference's actual operating point (py_tutorials/fictdom_ghostpen.py,
    symboliccutbfi.cpp:246-276 blocked B.D.Bt) — through the PUBLIC
    two-tier ``BilinearForm.Assemble`` and the matrix-free
    ``AssembleOperator``: per-stage rates, assembled-vs-matrix-free A/B,
    and an on-chip f32 integrity probe (operator symmetry error — the
    round-3 failure mode was bf16-pass einsums breaking symmetry)."""
    from ngsxfem_tpu import (
        MakeStructured3DMesh, H1, GridFunction, InterpolateToP1, CutInfo,
        HASNEG, IF, NEG, BilinearForm, SymbolicBFI, SymbolicFacetPatchBFI,
        GetFacetsWithNeighborTypes, GetDofsOfElements, grad, specialcf,
        Norm, sqrt, x, y, z, LevelSetMeshAdaptation,
    )
    from ngsxfem_tpu.solvers.krylov import cg

    pub = publish or (lambda o: None)
    out = {}

    def _one(order, nxo):
        _hb(f"high-order stage: order {order} (nx={nxo}, isoparametric)")
        mesh = MakeStructured3DMesh(
            hexes=False, nx=nxo, ny=nxo, nz=nxo,
            mapping=lambda a, b, c: (2 * a - 1, 2 * b - 1, 2 * c - 1))
        r = sqrt(x * x + y * y + z * z)
        lsa = LevelSetMeshAdaptation(mesh, order=order, threshold=0.2,
                                     discontinuous_qn=True)
        lsa.CalcDeformation(r - 0.7)
        lsetp1 = lsa.lset_p1
        mesh.SetDeformation(lsa.deform)
        try:
            ci = CutInfo(mesh, lsetp1)
            hasneg = ci.GetElementsOfType(HASNEG)
            hasif = ci.GetElementsOfType(IF)
            Vh = H1(mesh, order=order, dgjumps=True)
            ba_facets = GetFacetsWithNeighborTypes(mesh, a=hasneg, b=hasif)
            nl = 1.0 / Norm(grad(lsetp1)) * grad(lsetp1)
            u, v = Vh.TnT()
            h = specialcf.mesh_size
            lam = 10.0 * order * order
            a = BilinearForm(Vh)
            a += SymbolicBFI({"levelset": lsetp1, "domain_type": NEG},
                             form=grad(u) * grad(v),
                             definedonelements=hasneg)
            a += SymbolicBFI({"levelset": lsetp1, "domain_type": IF},
                             form=-(grad(u) * nl) * v - (grad(v) * nl) * u
                             + lam / h * u * v)
            a += SymbolicFacetPatchBFI(
                form=0.1 / (h * h) * (u - u.Other()) * (v - v.Other()),
                definedonelements=ba_facets)
            a.Assemble()  # compile
            t_asm, _ = _time(lambda: (a.Assemble(), a.mat.vals)[1],
                             reps=reps)
            op = a.AssembleOperator()
            dt = a.mat.vals.dtype
            x1 = jnp.cos(jnp.arange(Vh.ndof, dtype=dt))
            t_mv, _ = _time(op.matvec, x1, reps=reps)
            # f32 integrity: the continuous form is symmetric, so
            # |u.Av - v.Au| / |u.Av| measures on-chip evaluation error
            y1 = jnp.sin(jnp.arange(Vh.ndof, dtype=dt))
            uav = float(jnp.vdot(x1, op.matvec(y1)))
            vau = float(jnp.vdot(y1, op.matvec(x1)))
            sym_err = abs(uav - vau) / max(abs(uav), 1e-30)
            # matrix-free 50-iteration Jacobi-PCG
            d = op.diagonal()
            dinv = jnp.where(jnp.abs(d) > 1e-30, 1.0 / d, 1.0)
            active = np.asarray(GetDofsOfElements(Vh, hasneg), dtype=bool)
            b = jnp.asarray(np.where(active, 1.0, 0.0), dtype=dt)
            solve = jax.jit(lambda b: cg(op.matvec, b,
                                         M=lambda r_: dinv * r_,
                                         maxiter=CG_ITERS, tol=0.0))
            t_cg, (_, _, res) = _time(solve, b, reps=max(2, reps - 1))
            # marginal per-iteration slope (4x iters, same launch/stream
            # cost): the per-call figures are tunnel-launch-bound at this
            # size, the slope is the honest on-chip matvec rate
            marg = None
            if budget_left() > 60:
                solve4 = jax.jit(lambda b: cg(op.matvec, b,
                                              M=lambda r_: dinv * r_,
                                              maxiter=4 * CG_ITERS, tol=0.0))
                t_cg4, _ = _time(solve4, b, reps=max(2, reps - 1))
                marg = (t_cg4 - t_cg) / (3 * CG_ITERS)
            ne = mesh.ne
            return {
                "nx": nxo, "ne": ne, "ndof": Vh.ndof,
                "public_assemble_elts_per_sec": ne / t_asm,
                "public_assemble_seconds": t_asm,
                "matfree_matvec_seconds": t_mv,
                "matfree_cg50_seconds": t_cg,
                "matfree_cg50_rel_residual":
                    float(res) / (float(jnp.linalg.norm(b)) or 1.0),
                "matfree_marginal_iter_seconds": marg,
                "matfree_amortized_elts_per_sec":
                    (ne / marg if marg and marg > 0 else None),
                "matfree_bytes": op.nbytes(),
                "assembled_nnz_bytes": int(a.mat.vals.size
                                           * a.mat.vals.dtype.itemsize),
                "symmetry_rel_err": sym_err,
            }
        finally:
            mesh.UnsetDeformation()

    for order in orders:
        # gate at 120 s: with the persistent compile cache warm (the
        # normal driver case — the builder pre-runs bench.py) each order is
        # a handful of seconds; a COLD order-2/3 run costs ~140/250 s
        # (server-side compile chain, r4 tail), but partial results are
        # published per-order and the stage watchdog dumps them, so
        # starting an order that may not finish loses nothing
        if budget_left() < 120:
            out[f"order{order}"] = {"skipped": "bench budget exhausted"}
            pub(out)
            continue
        try:
            out[f"order{order}"] = _one(order, nx)
        except Exception as e:
            msg = f"{type(e).__name__}: {e}"[:300]
            # server-side compile crash (observed: order-3 nx=16
            # remote_compile HTTP 500, tpu_compile_helper exit 1): a
            # smaller mesh dodges the compile-helper blowup — a measured
            # number at nx=12 beats an error string at nx=16
            if (("remote_compile" in msg or "HTTP 500" in msg)
                    and nx > 12 and budget_left() > 120):
                try:
                    r2 = _one(order, 12)
                    r2["note"] = (f"nx={nx} compile crashed server-side; "
                                  "measured at nx=12")
                    out[f"order{order}"] = r2
                except Exception as e2:
                    out[f"order{order}"] = {
                        "error": msg,
                        "retry_error": f"{type(e2).__name__}: {e2}"[:200]}
            else:
                out[f"order{order}"] = {"error": msg}
        pub(out)
    return out


def bench_onchip_stage(nx, reps, stage_left, inner_partial, prebuild, t0s):
    """Headline f32 pipeline + fused Pallas PCG + lattice MG in ONE warm
    process — a JSON snapshot of everything measured so far is printed
    after EVERY measurement, and the parent folds the newest line into its
    own record (main()'s onchip reader).  The warm-process steady state is
    reliable; only process entry wedges (see main())."""
    def em(extra=None):
        if extra:
            inner_partial.update(extra)
        print(json.dumps(inner_partial), flush=True)

    em({"sync_seconds": round(time.perf_counter() - t0s, 1)})

    def pub(r):
        em({k: v for k, v in r.items() if not k.startswith("_")})

    # join the build thread (started before the entry sync read)
    t_j = time.perf_counter()
    while ("f32" not in prebuild and "error" not in prebuild
           and time.perf_counter() - t_j < 300):
        time.sleep(0.5)
    if "error" in prebuild:
        raise prebuild["error"]

    r32 = bench_pipeline(jnp.float32, nx, reps, publish=pub,
                         prebuilt=prebuild.get("f32"))
    ctx = r32.pop("_ctx", None)
    pub(r32)

    # MG BEFORE pallas: the lattice-MG / Jacobi-CG / cg_ir crossover is the
    # one field three rounds of verdicts demanded; on a slow-tunnel day
    # (2026-08-20: entry sync 108 s, headline done t+443 vs t+196 in r4)
    # only one of the two fits, and pallas numbers already landed in the
    # committed rehearsal record (bench_partial.json, docs/PERFORMANCE.md)
    if os.environ.get("BENCH_MG", "1") != "0" and stage_left() > 100:
        _hb("mg stage (warm process)")
        try:
            mg = bench_mg_solve(jnp.float32, nx, 2)
        except Exception as e:
            mg = {"error": f"{type(e).__name__}: {e}"[:400]}
        em({"mg_converged_solve": mg})

    if os.environ.get("BENCH_PALLAS", "1") != "0" and ctx is not None \
            and stage_left() > 80:
        _hb("fused Pallas PCG stage (real silicon)")
        try:
            pallas = bench_pallas_cg(ctx, max(2, reps - 1))
        except Exception as e:
            pallas = {"error": f"{type(e).__name__}: {e}"[:400]}
        em({"pallas_cg": pallas})
    return inner_partial


def main():
    nx = int(os.environ.get("BENCH_NX", "48"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    if os.environ.get("BENCH_INNER_CPUPIPE") == "1":
        # same XLA programs on the host CPU: a MEASURED hardware comparison
        # point next to the (unmeasurable, estimated) NGSolve baseline.
        assert jax.devices()[0].platform == "cpu", "cpu inner not on cpu"
        r = bench_pipeline(jnp.float32, nx, 2, scan=False, ir=False)
        print(json.dumps({
            "cpu_pipe_elts_per_sec": r["pipe_elts_per_sec"],
            "cpu_asm_elts_per_sec": r["asm_elts_per_sec"],
        }))
        return

    stage = os.environ.get("BENCH_INNER_STAGE")
    if stage:
        # wedge-isolated on-chip stage: runs in its OWN process so a tunnel
        # wedge costs only this stage (the shared-process 2026-08-19 run
        # lost f64+high_order+mg to one wedged D2H read; the tunnel serves
        # concurrent clients, verified same day)
        t0s = time.perf_counter()
        sb = float(os.environ.get("BENCH_STAGE_BUDGET", "600"))
        stage_left = lambda: sb - (time.perf_counter() - t0s)
        inner_partial = {}

        # stage-level watchdog + TERM handler: a stage that overruns or is
        # killed still prints the measurements completed so far as its last
        # stdout line — the parent's _reap parses exactly that
        def _dump_inner(reason):
            print(json.dumps({**inner_partial, "incomplete": reason}),
                  flush=True)
            os._exit(0)

        def _w():
            time.sleep(max(30.0, sb + 30.0))
            _dump_inner(f"stage watchdog: exceeded {sb:.0f}s budget")

        threading.Thread(target=_w, daemon=True).start()
        for _sig in (signal.SIGTERM, signal.SIGINT):
            try:
                signal.signal(_sig, lambda s, f: _dump_inner(
                    f"stage killed by signal {s}"))
            except (ValueError, OSError):
                pass

        # onchip: overlap the ~80 s host-side numpy model build with the
        # entry sync read (the numpy part never touches jax; only the
        # final device puts do, and those enqueue lazily)
        prebuild = {}
        if stage == "onchip":
            def _bt():
                try:
                    prebuild["f32"] = _build_fast(jnp.float32, nx)
                except Exception as e:
                    prebuild["error"] = e
            threading.Thread(target=_bt, daemon=True).start()

        def _pubprint(extra):
            """Streaming publish for the f64/high stages: update the
            partial AND print the snapshot line — the parent's reader
            folds the newest line live, so results measured before a
            mid-stage wedge/kill are never lost."""
            inner_partial.update(extra)
            print(json.dumps(inner_partial), flush=True)

        _ = float(jnp.sum(jnp.ones((8, 8), jnp.float32)))  # sync regime
        if stage == "onchip":
            out = bench_onchip_stage(nx, reps, stage_left, inner_partial,
                                     prebuild, t0s)
        elif stage == "f64":
            out = bench_f64_stage(nx, reps, budget_left=stage_left,
                                  publish=_pubprint)
        elif stage == "high":
            out = bench_high_order(int(os.environ.get("BENCH_HO_NX", "16")),
                                   (2, 3), max(2, reps - 1), stage_left,
                                   publish=_pubprint)
        elif stage == "mg":
            out = bench_mg_solve(jnp.float32, nx, 1)
        else:
            out = {"error": f"unknown stage {stage!r}"}
        print(json.dumps(out))
        return

    if os.environ.get("BENCH_INNER_COST") == "1":
        # XLA cost model of the EXACT pipeline program
        model, F, b, dd, _meta = _build_fast(jnp.float32, nx)
        out = {}
        for name, fn, args in (
            ("assemble", F["assemble"], (model.vertices, model.lset, dd)),
            ("pipeline", F["pipeline"],
             (model.vertices, model.lset, b, dd)),
        ):
            c = jax.jit(fn).lower(*args).compile().cost_analysis()
            if isinstance(c, list):
                c = c[0]
            out[name] = {"flops": float(c.get("flops", -1)),
                         "bytes": float(c.get("bytes accessed", -1))}
        print(json.dumps(out))
        return

    # SOFT budget: all in-process stage gates derive from it.  The driver's
    # observed kill arrives at ~780 s (BENCH_r04: rc=124 at t+780); the old
    # default of 2700 s meant every gate was calibrated against a budget
    # that never existed and the watchdog safety net sat 2040 s past the
    # kill.  HARD deadline: watchdog emission + exit (bounds a wedged
    # tunnel); the linger phase for concurrent subprocesses runs between
    # soft budget and hard deadline, emitting as results land.
    budget = float(os.environ.get("BENCH_BUDGET_SECONDS", "550"))
    hard = float(os.environ.get("BENCH_HARD_SECONDS", "740"))
    t_start = time.perf_counter()
    _install_term_handler()
    atexit.register(_kill_children)
    _start_watchdog(max(60.0, hard - (time.perf_counter() - _T0)))

    def budget_left():
        return budget - (time.perf_counter() - t_start)

    def hard_left():
        return hard - (time.perf_counter() - t_start)

    _PARTIAL.update({
        "metric": "3d_fictdom_pipeline_throughput",
        "value": 0.0, "unit": "elements/sec", "vs_baseline": 0.0,
        "baseline_note":
            "2e4 elts/s NGSolve figure is an unmeasured estimate",
    })

    # ---- tunnel-independent CPU stages, CONCURRENT subprocesses ---------
    # (XLA cost model of the exact pipeline program, the measured C++
    # speed-of-light proxy, and the host-XLA twin of the pipeline) — they
    # start immediately so their fields survive even a dead tunnel, and
    # they never occupy the on-chip critical path
    _here = os.path.dirname(os.path.abspath(__file__))
    _cpu_env = dict(os.environ, JAX_PLATFORMS="cpu")

    def _spawn(argv, env_key=None):
        env = dict(_cpu_env)
        if env_key:
            env[env_key] = "1"
        p = subprocess.Popen(argv, env=env, stdout=subprocess.PIPE,
                             stderr=subprocess.DEVNULL, text=True)
        _CHILDREN.append(p)
        return p

    def _collect(p, timeout):
        if p is None:
            return None
        try:
            out_, _ = p.communicate(timeout=max(5, timeout))
            return json.loads(out_.strip().splitlines()[-1])
        except Exception:
            try:
                p.kill()
            except Exception:
                pass
            return None

    # the single-threaded C++ proxy runs FIRST and ALONE: on a 1-core host
    # the concurrent children deflate it ~4x (2026-08-20 rehearsal: 9.9M
    # elts/s contended vs 36.9M standalone), which would inflate every
    # vs_cpu_proxy field — so its ~10 s measurement completes before
    # anything else spawns (bounded wait; binary is cached)
    p_proxy = (_spawn([sys.executable,
                       os.path.join(_here, "tools", "baseline_cpu.py"),
                       str(nx)])
               if os.environ.get("BENCH_PROXY", "1") != "0" else None)
    if p_proxy is not None:
        _hb("measuring CPU proxy uncontended")
        try:
            p_proxy.wait(timeout=90)
        except subprocess.TimeoutExpired:
            pass
    p_cost = (_spawn([sys.executable, os.path.abspath(__file__)],
                     "BENCH_INNER_COST")
              if os.environ.get("BENCH_COST", "1") != "0" else None)
    # the host-XLA twin is spawned only AFTER the cost child lands: on a
    # 1-core host the two starve each other and NEITHER finished in 700 s
    # (2026-08-20 rehearsal: no cost_model => no mfu/roofline fields) — the
    # cost model is a demanded headline field, the twin a nice-to-have
    p_cpu = None

    cost = proxy = cpu = None

    _collected = set()
    _poll_lock = threading.Lock()

    def _poll_cpu_stages(block_seconds=0):
        """Non-blocking (or bounded) collection of the CPU subprocesses.
        Called from the main thread AND the onchip reader thread (via
        _publish) — serialized by a lock; the non-blocking flavor simply
        skips when another thread holds it."""
        nonlocal cost, proxy, cpu, p_cpu
        if not _poll_lock.acquire(blocking=block_seconds != 0):
            return
        try:
            for name, p in (("cost", p_cost), ("proxy", p_proxy),
                            ("cpu", p_cpu)):
                if p is None or name in _collected:
                    continue
                if p.poll() is None and block_seconds == 0:
                    continue  # still running, non-blocking poll
                r = _collect(p, block_seconds)
                _collected.add(name)
                if name == "cost":
                    cost = r
                elif name == "proxy":
                    proxy = r
                    if r:
                        _PARTIAL["cpu_proxy"] = r
                else:
                    cpu = r
                    if r:
                        _PARTIAL["cpu_xla_measured"] = r
            if "cost" in _collected and p_cpu is None \
                    and os.environ.get("BENCH_CPU", "1") != "0":
                p_cpu = _spawn([sys.executable, os.path.abspath(__file__)],
                               "BENCH_INNER_CPUPIPE")
        finally:
            _poll_lock.release()

    # ---- publish helper: mirror the FULL schema into _PARTIAL ------------
    def _mfu_fields(r):
        if not (cost and r.get("t_pipe_k")):
            return None, None
        t_iter = r["t_pipe_k"] / SCAN_K
        fl = cost["pipeline"]["flops"]
        by = cost["pipeline"]["bytes"]
        if fl <= 0:
            return None, None
        mfu = fl / t_iter / V5E_PEAK_BF16_FLOPS
        roofline = {
            "flops_per_iter": fl,
            "hbm_bytes_per_iter": by,
            "arithmetic_intensity": fl / by if by > 0 else None,
            "hbm_speed_of_light_seconds": (by / V5E_HBM_BYTES_PER_SEC
                                           if by > 0 else None),
            "hbm_roofline_fraction": ((by / V5E_HBM_BYTES_PER_SEC) / t_iter
                                      if by > 0 else None),
            "amortized_iter_seconds": t_iter,
        }
        return mfu, roofline

    def _publish(r):
        """Fold the pipeline-stage fields measured SO FAR into _PARTIAL —
        called after every individual measurement, so the watchdog / crash
        emission always carries the newest complete snapshot."""
        _poll_cpu_stages()
        val = r.get("amortized_pipe_elts_per_sec",
                    r.get("pipe_elts_per_sec", 0.0))
        if val:
            _PARTIAL["value"] = round(val, 1)
            _PARTIAL["vs_baseline"] = round(
                val / NGSOLVE_BASELINE_ELTS_PER_SEC, 2)
            if proxy and proxy.get("pipeline_elts_per_sec"):
                _PARTIAL["vs_cpu_proxy"] = round(
                    val / proxy["pipeline_elts_per_sec"], 3)
        if proxy and proxy.get("elts_per_sec") \
                and _PARTIAL.get("assembly_elts_per_sec"):
            # assembly-ONLY vs the C++ proxy's assembly-only rate (the
            # BASELINE.json literal metric; PERFORMANCE.md carries the
            # roofline verdict on this number)
            _PARTIAL["vs_cpu_proxy_assembly"] = round(
                _PARTIAL["assembly_elts_per_sec"] / proxy["elts_per_sec"], 3)
        for src, dst in (("pipe_elts_per_sec", "percall_pipe_elts_per_sec"),
                         ("asm_elts_per_sec", "assembly_elts_per_sec"),
                         ("solve_iters_per_sec", "solve_iters_per_sec"),
                         ("pcg50_rel_residual", "pcg50_rel_residual"),
                         ("cg50_rel_residual", "cg50_rel_residual")):
            if src in r:
                _PARTIAL[dst] = round(r[src], 6)
        for k in ("ne", "ndof", "scan_k"):
            if k in r:
                _PARTIAL[k] = r[k]
        if "ir_solve_seconds" in r:
            _PARTIAL["converged_solve"] = {
                "method": "mixed-precision iterative refinement "
                          f"({IR_OUTER}x{IR_INNER} f32 PCG + f64 residuals)",
                "seconds": r.get("ir_solve_seconds"),
                "true_f64_rel_residual": r.get("ir_true_rel_residual"),
                "tol_asserted": SOLVE_TOL,
                "pipe_elts_per_sec": r.get("converged_pipe_elts_per_sec"),
            }
        mfu, roofline = _mfu_fields(r)
        if mfu:
            _PARTIAL["mfu_estimate"] = round(mfu, 5)
            _PARTIAL["roofline"] = roofline
        # EMIT after every measurement: the driver parses the last stdout
        # line, so each enriched snapshot supersedes the previous one
        _emit()

    # ---- on-chip stages: ALL in a dedicated child process -----------------
    # Round-5 rehearsal observation (2026-08-20): the first D2H read of a
    # process can wedge for 9+ minutes WHILE a concurrently spawned process
    # syncs in seconds — tunnel entry is a per-process lottery, and the
    # parent must never hold a losing ticket.  The parent therefore NEVER
    # touches the TPU: the headline+pallas+mg stages run in ONE "onchip"
    # child that streams a JSON snapshot line after every measurement (the
    # warm-process steady state is reliable; the wedge risk lives at
    # entry).  If the child fails to sync within BENCH_ENTRY_DEADLINE the
    # parent kills it and spawns a fresh one — a new lottery ticket.
    # Mid-run wedges are bounded by the child's own stage watchdog, and
    # every measurement already folded into _PARTIAL stays recorded.
    _PARTIAL["timing_note"] = (
        "value = amortized K-iteration in-program rate (lax.scan over "
        f"{SCAN_K} chained pipeline iterations with a carried "
        f"representable {SCAN_FEEDBACK:g}-scaled data dependency, "
        "synchronous completed-execution regime); per-call rates "
        "include per-launch tunnel overhead and are lower bounds")
    _PARTIAL["baseline_note"] = (
        "2e4 elts/s NGSolve figure is an unmeasured estimate; "
        "vs_cpu_proxy divides by the MEASURED single-core C++ "
        "speed-of-light proxy (native/baseline_cpu_proxy.cpp, BASELINE.md)")
    _PARTIAL["cg_iters"] = CG_ITERS

    # -- onchip child: spawn with entry-retry ------------------------------
    onchip = {"latest": {}, "alive_line": False, "proc": None}

    def _fold_onchip(d):
        onchip["latest"] = d
        onchip["alive_line"] = True
        for k in ("pallas_cg", "mg_converged_solve"):
            if k in d:
                _PARTIAL[k] = d[k]
        if "sync_seconds" in d:
            _PARTIAL["onchip_sync_seconds"] = d["sync_seconds"]
        if "incomplete" in d:
            _PARTIAL["onchip_incomplete"] = d["incomplete"]
        _publish(d)

    def _stream_reader(p, fold):
        """Fold every JSON line the child prints, as it prints it."""
        def run():
            try:
                for line in p.stdout:
                    s = line.strip()
                    if not s.startswith("{"):
                        continue
                    try:
                        fold(json.loads(s))
                    except ValueError:
                        continue
            except Exception:
                pass
        t = threading.Thread(target=run, daemon=True)
        t.start()
        return t

    def _spawn_onchip():
        env = dict(os.environ, BENCH_INNER_STAGE="onchip",
                   BENCH_STAGE_BUDGET=str(int(max(60.0, hard_left() - 40))))
        p = subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                             env=env, stdout=subprocess.PIPE, text=True)
        _CHILDREN.append(p)
        return p

    # ENTRY LOTTERY, additive tickets: tunnel entry can wedge for minutes
    # (rehearsal: a parent D2H read wedged 9+ min while a freshly spawned
    # sibling synced in 47 s; minutes later three fresh processes all
    # wedged through a global outage).  Killing a wedged candidate loses
    # its queue position for nothing, so instead we KEEP every candidate
    # alive and add a fresh one every BENCH_ENTRY_RESPAWN seconds (cap 4):
    # whichever syncs first wins and the rest are killed.  Under a global
    # outage the earliest candidate wins the moment the tunnel recovers.
    def _winner_fold(p):
        def fold(d):
            w = onchip.get("winner")
            if w is None:
                onchip["winner"] = w = p
            if w is not p:
                return  # late line from a killed loser
            _fold_onchip(d)
        return fold

    ENTRY_RESPAWN = float(os.environ.get("BENCH_ENTRY_RESPAWN", "75"))
    candidates = []
    while hard_left() > 90 and not onchip["alive_line"]:
        if len(candidates) < 4 and (
                not candidates
                or time.perf_counter() - candidates[-1][1] >= ENTRY_RESPAWN):
            _hb(f"spawning onchip candidate #{len(candidates) + 1} "
                f"(budget left {budget_left():.0f}s)")
            p = _spawn_onchip()
            _stream_reader(p, _winner_fold(p))
            candidates.append((p, time.perf_counter()))
            if len(candidates) > 1:
                _PARTIAL["entry_retries"] = len(candidates) - 1
                _emit(note=f"onchip entry wedged; "
                           f"{len(candidates)} candidates outstanding")
        crashed = [p for p, _ in candidates if p.poll() not in (None, -9)]
        if crashed and not onchip["alive_line"]:
            # a candidate died on its own before syncing: a real crash
            # (import error etc.), not a wedge — don't loop on it
            _PARTIAL["onchip_error"] = (
                f"onchip child exited rc={crashed[0].poll()} before syncing")
            _emit(note="onchip child crashed before sync")
            break
        _poll_cpu_stages()
        time.sleep(2.0)
    if onchip.get("winner") is not None:
        onchip["proc"] = onchip["winner"]
        for p, _ in candidates:
            if p is not onchip["proc"]:
                try:
                    p.kill()
                except Exception:
                    pass
        _hb(f"onchip candidate won entry "
            f"({len(candidates)} tickets outstanding)")

    # -- f64/high children + linger to the hard deadline -------------------
    # spawned once the onchip child proves the tunnel healthy (first
    # assembly rate lands): their dominant cost is the server-side compile
    # (f64 nx=48 assembly ~950 s cold; high-order a chain of small
    # compiles, ~384 s cold in r4), which the persistent compilation cache
    # (ngsxfem_tpu/config.py) makes nearly free on re-runs.
    def _spawn_stage(name):
        env = dict(os.environ, BENCH_INNER_STAGE=name,
                   BENCH_STAGE_BUDGET=str(int(max(60.0, hard_left() - 60))))
        _hb(f"spawning concurrent {name} stage subprocess")
        p = subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                             env=env, stdout=subprocess.PIPE,
                             stderr=subprocess.DEVNULL, text=True)
        _CHILDREN.append(p)
        return p

    p_f64 = p_high = None

    def _extra_fold(key):
        def fold(d):
            _PARTIAL[key] = d
            _hb(f"{key} snapshot folded")
            _emit()
        return fold

    def _maybe_spawn_extra():
        # spawn once the HEADLINE amortized scan is measured — spawning at
        # first-assembly time contended with the PCG/pipeline timings
        # (rehearsal 2: solve_iters_per_sec halved), but waiting for IR+mg
        # starves the children's own entry lottery on wedge days
        # (rehearsal 3: entry took 4 tickets/275 s and the t+498 children
        # got nothing; each child must win entry itself)
        nonlocal p_f64, p_high
        if hard_left() < 120 or "scan_k" not in _PARTIAL:
            return
        if p_f64 is None and os.environ.get("BENCH_F64", "1") != "0":
            p_f64 = _spawn_stage("f64")
            _stream_reader(p_f64, _extra_fold("f64_native"))
        if p_high is None and os.environ.get("BENCH_HIGH_ORDER", "1") != "0":
            p_high = _spawn_stage("high")
            _stream_reader(p_high, _extra_fold("high_order"))
        if (p_f64 is not None or p_high is not None) \
                and "concurrency_note" not in _PARTIAL:
            _PARTIAL["concurrency_note"] = (
                "mg (and late pallas sub-stages) were measured while the "
                "f64 and high-order stage subprocesses ran concurrently "
                "against the same chip (their cost is dominated by "
                "server-side compiles; residual on-chip contention may "
                "skew those rates slightly)")

    _hb(f"linger: folding children until t+{hard - 30:.0f}s")
    while hard_left() > 30:
        _poll_cpu_stages()
        _maybe_spawn_extra()
        oc = onchip["proc"]
        oc_done = oc is None or oc.poll() is not None
        extras_pending = (
            (p_f64 is not None and p_f64.poll() is None)
            or (p_high is not None and p_high.poll() is None))
        could_spawn = (p_f64 is None or p_high is None) and oc_done is False
        cpu_pending = len(_collected) < sum(
            x is not None for x in (p_cost, p_proxy, p_cpu))
        if oc_done and not extras_pending and not could_spawn \
                and not cpu_pending:
            # nothing left that could land — also covers the crashed-onchip
            # case where the extras were never spawned
            break
        time.sleep(2.0)
    for key, pp_ in (("f64_native", p_f64), ("high_order", p_high)):
        if pp_ is not None and pp_.poll() is None:
            if isinstance(_PARTIAL.get(key), dict):
                _PARTIAL[key]["incomplete_at_deadline"] = True
            else:
                _PARTIAL[key] = {
                    "error": f"concurrent {key} stage produced nothing by "
                             f"the t+{hard - 30:.0f}s deadline"}
            try:
                pp_.kill()
            except Exception:
                pass

    # ---- collect the concurrent CPU stages (bounded wait) ----------------
    _hb("collecting CPU subprocess stages")
    cost = cost or _collect(p_cost, max(10, min(120, hard_left())))
    proxy = proxy or _collect(p_proxy, max(10, min(60, hard_left())))
    cpu = cpu or _collect(p_cpu, max(10, min(60, hard_left())))
    if proxy:
        _PARTIAL["cpu_proxy"] = proxy
    if cpu:
        _PARTIAL["cpu_xla_measured"] = cpu
    if cost:
        # raw per-program cost model (assembly-only roofline verdict,
        # docs/PERFORMANCE.md) next to the derived mfu/roofline fields
        _PARTIAL["cost_model"] = cost
    _hb("emitting final JSON")
    # re-derive mfu/vs_cpu_proxy now that cost/proxy landed
    _publish(onchip["latest"])


def _emit_failure(e):
    """The driver must ALWAYS receive one JSON line — a dead TPU tunnel
    (backend init UNAVAILABLE) or a mid-run crash emits the completed
    stages plus the error instead of a bare traceback."""
    import traceback

    out = _PARTIAL
    out["error"] = f"{type(e).__name__}: {e}"[:500]
    if not out.get("value"):
        # the tunnel outage must not erase the round's on-chip history:
        # point at the figures measured earlier this round (NOT this run —
        # clearly labeled; methodology + per-stage numbers in the doc)
        out["last_measured_this_round"] = {
            "note": "measured on-chip 2026-08-17 before the tunnel outage; "
                    "NOT from this run — see docs/PERFORMANCE.md",
            "amortized_pipe_elts_per_sec": 2.10e7,
            "percall_pipe_elts_per_sec": 1.30e7,
            "assembly_elts_per_sec": 1.36e7,
            "nx": 48,
        }
    traceback.print_exc(file=sys.stderr)
    _emit()
    _kill_children()


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001 - always emit the JSON line
        _emit_failure(e)
        sys.exit(0)
