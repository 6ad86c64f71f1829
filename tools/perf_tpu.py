"""TPU perf exploration: SpMV variants + assembly/pipeline scaling.

Times SYNCHRONOUS completed executions (see bench.py's docstring: the
tunneled runtime executes lazily, so async timings measure enqueue only;
the synchronous regime is entered by the first device->host read and is
the only observable-completion mode).

    python tools/perf_tpu.py [nx ...]
"""
import os
import sys
import time

os.environ.setdefault("NGSXFEM_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

# Honor JAX_PLATFORMS BEFORE the first device touch: the axon PJRT plugin
# outranks the env var (ngsxfem_tpu/config.py does the same dance), and the
# first D2H read below would wedge on the axon device when the tunnel is
# down even though the user asked for cpu.
if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

# enter the synchronous (observable-completion) regime up front
_ = float(jnp.sum(jnp.ones((8, 8))))


def timeit(f, *a, reps=3):
    o = f(*a)
    jax.block_until_ready(o)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = f(*a)
        jax.block_until_ready(o)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def public_api_ab(nx, t_model_asm):
    """A/B: the PUBLIC BilinearForm.Assemble on the fictdom workload vs the
    hand-written model's assembly rate (VERDICT r2 item 3 done-criterion:
    within ~2x after the two-tier compaction landed in _volume_tiers)."""
    import numpy as np
    from ngsxfem_tpu import (
        MakeStructured3DMesh, H1, GridFunction, InterpolateToP1, CutInfo,
        HASNEG, IF, NEG, BilinearForm, SymbolicBFI, SymbolicFacetPatchBFI,
        GetFacetsWithNeighborTypes, grad, specialcf, Norm, sqrt, x, y, z,
    )

    mesh = MakeStructured3DMesh(hexes=False, nx=nx, ny=nx, nz=nx)
    lsetp1 = GridFunction(H1(mesh, order=1))
    InterpolateToP1(
        sqrt((x - .5) ** 2 + (y - .5) ** 2 + (z - .5) ** 2) - 0.4, lsetp1)
    ci = CutInfo(mesh, lsetp1)
    hasneg = ci.GetElementsOfType(HASNEG)
    hasif = ci.GetElementsOfType(IF)
    V = H1(mesh, order=1, dgjumps=True)
    u, v = V.TnT()
    h = specialcf.mesh_size
    nl = 1.0 / Norm(grad(lsetp1)) * grad(lsetp1)
    gp = GetFacetsWithNeighborTypes(mesh, a=hasneg, b=hasif)
    a = BilinearForm(V)
    a += SymbolicBFI({"levelset": lsetp1, "domain_type": NEG},
                     form=grad(u) * grad(v), definedonelements=hasneg)
    a += SymbolicBFI({"levelset": lsetp1, "domain_type": IF},
                     form=-(grad(u) * nl) * v - (grad(v) * nl) * u
                     + 20.0 / h * u * v)
    a += SymbolicFacetPatchBFI(form=0.1 / (h * h) * (u - u.Other())
                               * (v - v.Other()), definedonelements=gp)
    a.Assemble()  # compile

    def do():
        a.Assemble()
        return a.mat.vals

    t = timeit(do, reps=3)
    rate = mesh.ne / t
    print(f"  public BilinearForm.Assemble (fictdom, nx={nx}): "
          f"{rate/1e6:.2f}M elts/s ({t*1e3:.1f} ms) — "
          f"{t / t_model_asm:.2f}x the hand-written model's assembly time")
    return t


def subdiv_ab(nx=32, lvl=2, order=2):
    """Banded vs uniform ``subdivlvl`` Integrate A/B (VERDICT r4 item 5
    done-criterion: banded cost scales with the interface band).  Values
    are asserted equal; the work ratio ~ ne / band_capacity."""
    from ngsxfem_tpu import Integrate, MakeStructured3DMesh, NEG, sqrt, x, y, z
    from ngsxfem_tpu.config import config

    mesh = MakeStructured3DMesh(hexes=False, nx=nx, ny=nx, nz=nx)
    ls = sqrt((x - .5) ** 2 + (y - .5) ** 2 + (z - .5) ** 2) - 0.4
    ld = {"levelset": ls, "domain_type": NEG, "subdivlvl": lvl}
    out = {}
    modes = (("banded+d1", True, True), ("banded-d0", True, False),
             ("uniform  ", False, False))
    for name, banded, d1 in modes:
        config.banded_subdiv = banded
        config.subdiv_depth1_prune = d1
        try:
            v = Integrate(ld, cf=1.0, mesh=mesh, order=order)  # compile
            t = timeit(lambda: Integrate(ld, cf=1.0, mesh=mesh, order=order),
                       reps=3)
        finally:
            config.banded_subdiv = True
            config.subdiv_depth1_prune = True
        out[banded, d1] = (t, v)
        print(f"  subdiv lvl={lvl} nx={nx} {name}"
              f": {t*1e3:8.1f} ms  val={v:.8f}")
    tb, vb = out[True, True]
    tb0, vb0 = out[True, False]
    tu, vu = out[False, False]
    print(f"  banded+depth1 speedup {tu/tb:.2f}x vs uniform, "
          f"{tb0/tb:.2f}x vs whole-band cut tier (r4 banded); "
          f"|banded-uniform| = {abs(vb-vu):.2e}, "
          f"|d1-d0| = {abs(vb-vb0):.2e}")
    # tier-1 takes the plain rule (the reference's depth-0 pruning), so
    # agreement is quadrature-exactness + dtype roundoff, not bitwise
    eps = float(np.finfo(np.dtype(config.dtype)).eps)
    assert abs(vb - vu) < 4e3 * eps * max(1.0, abs(vu)), (vb, vu)
    return out


def main():
    from ngsxfem_tpu.models.poisson import UnfittedPoisson
    from ngsxfem_tpu.solvers.sparse import ELLMatrix
    from ngsxfem_tpu.solvers.krylov import cg

    sizes = [int(a) for a in sys.argv[1:]] or [32, 48, 64]
    report = []
    for nx in sizes:
        model = UnfittedPoisson(nx=nx, dim=3, order=1, dtype=jnp.float32)
        vals_host = model.lset_np[model.mesh.elements_np]
        ncut = int((((vals_host < 0).any(1)) & ((vals_host > 0).any(1))).sum())
        cap = int(ncut * 1.2) + 8
        struct = model.ell_structure()
        cols_np = np.asarray(struct["ell_cols"])
        gtable = model.ell_gather_structure(struct)
        # big index tables go in as ARGUMENTS: baked-as-literals they blow the
        # remote-compile request limit (HTTP 413), and closure device arrays
        # poison dispatch (bench.py docstring) — args avoid both
        K = struct["K"]
        struct_dev = {k: jnp.asarray(v) for k, v in struct.items() if k != "K"}
        gtable_dev = jnp.asarray(gtable)

        # beyond ~0.5M elements the unblocked temporaries OOM HBM (XLA pads
        # the small trailing dims ~40x) -> stream in element blocks
        blk = None if model.mesh.ne <= 700_000 else 131072

        @jax.jit
        def assemble(v, l, st):
            return model.assemble_ell_vals(v, l, cap, dict(st, K=K), block=blk)

        @jax.jit
        def assemble_g(v, l, st, gt):
            return model.assemble_ell_vals_gather(v, l, cap, dict(st, K=K), gt,
                                                  block=blk)

        @jax.jit
        def mv_jnp(vals, cols, x):
            return jnp.sum(vals * x[cols], axis=1)

        @jax.jit
        def mv_pallas(vals, cols, x):
            return ELLMatrix(cols, vals, (x.shape[0], x.shape[0])).matvec_pallas(x)

        @jax.jit
        def solve50(vals, cols, b):
            rid = jnp.arange(cols.shape[0])[:, None]
            diag = jnp.sum(jnp.where(cols == rid, vals, 0.0), axis=1)
            dinv = jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 1.0)
            mv = lambda x: jnp.sum(vals * x[cols], axis=1)
            return cg(mv, b, maxiter=50, tol=0.0, M=lambda r: dinv * r)

        # ---- lattice/DIA fast path (structured meshes; bench.py headline) --
        from ngsxfem_tpu.solvers.sparse import dia_matvec
        dst = model.dia_structure()
        offs = dst["offsets"]
        k0 = int(np.searchsorted(offs, 0))
        dd_static = {k: w for k, w in dst.items() if "slots" not in k}
        dd = {k: jnp.asarray(w) for k, w in dst.items() if "slots" in k}

        @jax.jit
        def assemble_lat(v, l, dd):
            return model.assemble_vals_lattice(v, l, {**dd_static, **dd})

        @jax.jit
        def mv_dia(V, x):
            return dia_matvec(offs, V, x)

        @jax.jit
        def solve50_dia(V, b):
            dinv = jnp.where(jnp.abs(V[k0]) > 1e-30, 1.0 / V[k0], 1.0)
            return cg(lambda x: dia_matvec(offs, V, x), b,
                      maxiter=50, tol=0.0, M=lambda r: dinv * r)

        v, l = model.vertices, model.lset
        b = jnp.where(jnp.asarray(model.active_dofs), 1.0, 0.0).astype(jnp.float32)
        colsj = jnp.asarray(cols_np)
        ell_vals, n_dev = assemble(v, l, struct_dev)
        jax.block_until_ready(ell_vals)
        assert int(n_dev) <= cap, (int(n_dev), cap)  # overflow check

        t_asm = timeit(assemble, v, l, struct_dev, reps=5)
        t_asg = timeit(assemble_g, v, l, struct_dev, gtable_dev, reps=5)
        t_mv = timeit(mv_jnp, ell_vals, colsj, b, reps=5)
        try:
            t_mvp = timeit(mv_pallas, ell_vals, colsj, b, reps=5)
        except Exception as e:
            t_mvp = None
        t_cg = timeit(solve50, ell_vals, colsj, b, reps=2)

        V_lat, _ = assemble_lat(v, l, dd)
        jax.block_until_ready(V_lat)
        b_lat = jnp.asarray(
            np.where(model.active_dofs[dst["perm_inv"]], 1.0, 0.0),
            dtype=jnp.float32)
        t_lat = timeit(assemble_lat, v, l, dd, reps=5)
        t_mvd = timeit(mv_dia, V_lat, b_lat, reps=5)
        t_cgd = timeit(solve50_dia, V_lat, b_lat, reps=2)

        report.append((nx, model.mesh.ne, model.ndof, t_asm, t_asg, t_mv,
                       t_mvp, t_cg, t_lat, t_mvd, t_cgd))
        if os.environ.get("PERF_AB", "1") != "0" and nx == sizes[0]:
            public_api_ab(nx, t_asm)
    if os.environ.get("PERF_SUBDIV", "1") != "0":
        subdiv_ab(nx=int(os.environ.get("PERF_SUBDIV_NX", "32")),
                  lvl=int(os.environ.get("PERF_SUBDIV_LVL", "2")))

    # host reads only now
    for (nx, ne, ndof, t_asm, t_asg, t_mv, t_mvp, t_cg,
         t_lat, t_mvd, t_cgd) in report:
        print(f"nx={nx} ne={ne} ndof={ndof}: "
              f"asm-scatter {ne/t_asm/1e6:.2f}M elts/s ({t_asm*1e3:.1f} ms), "
              f"asm-gather {ne/t_asg/1e6:.2f}M elts/s ({t_asg*1e3:.1f} ms), "
              f"spmv jnp {t_mv*1e6:.0f} us"
              + (f", pallas {t_mvp*1e6:.0f} us" if t_mvp else ", pallas n/a")
              + f", cg50 {t_cg*1e3:.2f} ms")
        print(f"      lattice/DIA: asm {ne/t_lat/1e6:.2f}M elts/s "
              f"({t_lat*1e3:.1f} ms), spmv dia {t_mvd*1e6:.0f} us, "
              f"cg50 {t_cgd*1e3:.2f} ms")


if __name__ == "__main__":
    main()
