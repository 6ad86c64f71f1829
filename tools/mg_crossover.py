"""Converged-solve crossover on the REAL chip: lattice DIA MG (incl.
prepare) vs Jacobi-CG vs mixed-precision iterative refinement (cg_ir), at
benchmark scale — the VERDICT r4 item-6 table (docs/PERFORMANCE.md names
the production default from this data).

    python tools/mg_crossover.py [nx ...]     # default: 48 64

Prints one JSON line per size.  MG/Jacobi solve to the SAME 1e-8 relative
tolerance (bench.bench_mg_solve); cg_ir is the flagship fixed-budget
refinement whose TRUE f64 residual lands far below it (reported).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("NGSXFEM_TPU_X64", "0")

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from bench import _build_fast, _time, bench_mg_solve  # noqa: E402


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [48, 64]
    _ = float(jnp.sum(jnp.ones((8, 8), jnp.float32)))  # sync regime
    print(f"# synced on {jax.devices()[0].device_kind}", file=sys.stderr,
          flush=True)
    for nx in sizes:
        t0 = time.perf_counter()
        mg = bench_mg_solve(jnp.float32, nx, 2)
        print(f"# nx={nx} mg stage done in {time.perf_counter()-t0:.0f}s",
              file=sys.stderr, flush=True)
        model, F, b, dd, _meta = _build_fast(jnp.float32, nx)
        V, _n = jax.jit(F["assemble"])(model.vertices, model.lset, dd)
        jax.block_until_ready(V)
        t_ir, (_x, res64) = _time(jax.jit(F["ir"]), V, b, reps=3)
        r0 = float(jnp.linalg.norm(b))
        out = {
            "nx": nx,
            "ne": model.mesh.ne,
            "ndof": model.ndof,
            "mg": {k: v for k, v in mg.items() if k != "design"},
            "cg_ir_seconds": t_ir,
            "cg_ir_true_rel_residual": float(res64) / r0,
        }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
