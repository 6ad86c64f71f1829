"""Fused VMEM-resident Pallas CG (solvers/pallas_cg.py).

Runs the kernel in interpreter mode on the CPU backend and checks it
against the plain ``krylov.cg`` + ``dia_matvec`` fixed-budget path — the
two must agree to f32 reduction-order roundoff (same algorithm, same
operator, different reduction orders).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ngsxfem_tpu.models.poisson import UnfittedPoisson
from ngsxfem_tpu.solvers.sparse import dia_matvec
from ngsxfem_tpu.solvers.krylov import cg
from ngsxfem_tpu.solvers import pallas_cg


def _setup(nx):
    m = UnfittedPoisson(nx=nx, dim=3, order=1, dtype=jnp.float32)
    d = m.dia_structure()
    dd_static = {k: v for k, v in d.items() if "slots" not in k}
    dd = {k: jnp.asarray(v) for k, v in d.items() if "slots" in k}
    V, _ = m.assemble_vals_lattice(m.vertices, m.lset,
                                   {**dd_static, **dd})
    offs = d["offsets"]
    k0 = int(np.searchsorted(np.asarray(offs), 0))
    b = jnp.asarray(np.where(m.active_dofs[d["perm_inv"]], 1.0, 0.0),
                    dtype=jnp.float32)
    dinv = jnp.where(jnp.abs(V[k0]) > 1e-30, 1.0 / V[k0], 1.0)
    return m, offs, V, b, dinv, k0


def test_dia_table_symmetric():
    """The fused kernel's halved storage relies on exact DIA symmetry."""
    _, offs, V, _, _, _ = _setup(6)
    offs_np = np.asarray(offs)
    Vn = np.asarray(V)
    n = Vn.shape[1]
    for k, o in enumerate(offs_np):
        if o <= 0:
            continue
        km = int(np.where(offs_np == -o)[0][0])
        assert np.array_equal(Vn[k][: n - o], Vn[km][o:]), f"offset {o}"


def test_flat_roll_matches_numpy():
    rng = np.random.default_rng(0)
    R, L = 5, 12
    v = rng.standard_normal((R, L)).astype(np.float32)
    for s in [0, 1, 7, L - 1, L, L + 3, 2 * L + 5, -1, -L - 4, -2 * L - 11]:
        got = np.asarray(pallas_cg._flat_roll(jnp.asarray(v), s, L))
        want = np.roll(v.reshape(-1), -s).reshape(R, L)
        assert np.allclose(got, want), s


def test_sym_matvec_equals_dia_matvec():
    _, offs, V, b, _, _ = _setup(6)
    n = b.shape[0]
    L = 7 * 7
    k0_full, pos_full = pallas_cg._upper(offs)
    rows = [k0_full] + [k for k, _ in pos_full]
    pos_up = [(i + 1, o) for i, (_, o) in enumerate(pos_full)]
    vals_up = [V[k].reshape(n // L, L) for k in rows]
    y2 = pallas_cg._sym_dia_matvec_2d(vals_up, b.reshape(n // L, L),
                                      0, pos_up, L)
    y_ref = dia_matvec(offs, V, b)
    assert float(jnp.max(jnp.abs(y2.reshape(n) - y_ref))) <= \
        1e-6 * float(jnp.max(jnp.abs(y_ref)) + 1)


@pytest.mark.parametrize("iters", [1, 12])
def test_fused_cg_matches_reference(iters):
    _, offs, V, b, dinv, k0 = _setup(6)
    xr, _, rr = cg(lambda x: dia_matvec(offs, V, x), b,
                   M=lambda r: dinv * r, maxiter=iters, tol=0.0)
    xf, rf = pallas_cg.dia_cg_fused(offs, V, b, dinv, iters,
                                    plane=7 * 7, interpret=True)
    rel = float(jnp.linalg.norm(xr - xf) / jnp.maximum(
        jnp.linalg.norm(xr), 1e-30))
    assert rel < 5e-5, rel
    assert abs(float(rr) - float(rf)) <= 5e-5 * float(jnp.linalg.norm(b))


def test_fused_cg_reduces_residual():
    _, offs, V, b, dinv, _ = _setup(6)
    _, rf = pallas_cg.dia_cg_fused(offs, V, b, dinv, 40,
                                   plane=7 * 7, interpret=True)
    assert float(rf) < 0.05 * float(jnp.linalg.norm(b))


def test_fused_cg_on_tpu_hardware():
    """Non-interpret path: Mosaic lowering of the static-roll matvec, the
    raised vmem_limit_bytes, and the SMEM scalar output — exercised on real
    silicon.  Skipped on the CPU suite (conftest forces JAX_PLATFORMS=cpu);
    run with the TPU backend live (bench.py runs the same check on-chip)."""
    if jax.devices()[0].platform != "tpu":
        pytest.skip("requires a real TPU backend (suite runs on CPU)")
    _, offs, V, b, dinv, k0 = _setup(6)
    xr, _, rr = cg(lambda x: dia_matvec(offs, V, x), b,
                   M=lambda r: dinv * r, maxiter=25, tol=0.0)
    xf, rf = pallas_cg.dia_cg_fused(offs, V, b, dinv, 25, plane=7 * 7)
    rel = float(jnp.linalg.norm(xr - xf) / jnp.maximum(
        jnp.linalg.norm(xr), 1e-30))
    assert rel < 5e-4, rel


def test_fused_cg_rejects_asymmetric_offsets():
    with pytest.raises(ValueError):
        pallas_cg._upper([-1, 0, 2])


def test_fused_cg_rejects_bad_plane():
    _, offs, V, b, dinv, _ = _setup(6)
    with pytest.raises(ValueError):
        pallas_cg.dia_cg_fused(offs, V, b, dinv, 2, plane=10)
