"""Lattice DIA multigrid (solvers/latticemg.py) — the gather-free cut-MG.

Covers: transfer-operator transpose identity, V-cycle as a CG
preconditioner (converges, beats Jacobi-CG in iterations), device-resident
coarse inverse (no host factorization), and active-set masking.
Reference analog: python/cutmg.py MultiGridCL / CutFemSmoother.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ngsxfem_tpu.models.poisson import UnfittedPoisson
from ngsxfem_tpu.solvers.sparse import dia_matvec
from ngsxfem_tpu.solvers.krylov import cg
from ngsxfem_tpu.solvers.latticemg import (LatticeDIAMG, _interp_axis,
                                           _restrict_axis)
from ngsxfem_tpu.config import config as cfg


def _level(nx, dtype=jnp.float64):
    m = UnfittedPoisson(nx=nx, dim=3, order=1, dtype=dtype)
    d = m.dia_structure()
    dd = {k: (jnp.asarray(v) if "slots" in k else v) for k, v in d.items()}
    V, _ = jax.jit(lambda v, l: m.assemble_vals_lattice(v, l, dd))(
        m.vertices, m.lset)
    act = m.active_dofs[d["perm_inv"]]
    ge = m.lset_np[m.mesh.elements_np]
    ge = np.where(np.abs(ge) < cfg.lset_eps,
                  np.where(ge >= 0, cfg.lset_eps, -cfg.lset_eps), ge)
    cut = (ge < 0).any(1) & (ge > 0).any(1)
    ifd = np.zeros(m.ndof, bool)
    ifd[m.space.el2dof_np[cut].ravel()] = True
    return m, d["offsets"], V, act, (ifd & m.active_dofs)[d["perm_inv"]]


def test_transfer_transpose_identity():
    """<P xc, yf> == <xc, R yf>: restriction is the exact transpose of the
    separable trilinear prolongation."""
    rng = np.random.default_rng(0)
    for dim, nc in ((2, 5), (3, 4)):
        nf = 2 * nc - 1
        xc = rng.standard_normal((nc,) * dim)
        yf = rng.standard_normal((nf,) * dim)
        px = jnp.asarray(xc)
        for ax in range(dim):
            px = _interp_axis(px, ax)
        ry = jnp.asarray(yf)
        for ax in range(dim):
            ry = _restrict_axis(ry, ax)
        lhs = float(jnp.vdot(px, jnp.asarray(yf)))
        rhs = float(jnp.vdot(jnp.asarray(xc), ry))
        assert abs(lhs - rhs) < 1e-12 * max(1.0, abs(lhs)), (dim, lhs, rhs)


def test_prolongation_reproduces_linears():
    """Trilinear interpolation is exact on linear lattice functions."""
    nc = 5
    g = np.linspace(0.0, 1.0, nc)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    lin = 2.0 * X - 0.5 * Y + 3.0 * Z + 1.0
    p = jnp.asarray(lin)
    for ax in range(3):
        p = _interp_axis(p, ax)
    gf = np.linspace(0.0, 1.0, 2 * nc - 1)
    Xf, Yf, Zf = np.meshgrid(gf, gf, gf, indexing="ij")
    want = 2.0 * Xf - 0.5 * Yf + 3.0 * Zf + 1.0
    assert np.allclose(np.asarray(p), want, atol=1e-13)


@pytest.fixture(scope="module")
def hierarchy():
    nxs = [4, 8, 16]
    levs = [_level(n) for n in nxs]
    mg = LatticeDIAMG([lv[1] for lv in levs], [n + 1 for n in nxs], dim=3,
                      active_masks=[lv[3] for lv in levs],
                      if_masks=[None] + [lv[4] for lv in levs[1:]])
    params = mg.params([lv[2] for lv in levs], dtype=jnp.float64)
    pp = jax.jit(mg.prepare)(params)
    return levs, mg, pp


def test_latticemg_cg_converges_and_beats_jacobi(hierarchy):
    levs, mg, pp = hierarchy
    offs = levs[-1][1]
    Vf = levs[-1][2]
    b = jnp.asarray(np.where(levs[-1][3], 1.0, 0.0), jnp.float64)
    TOL = 1e-8

    solve = jax.jit(lambda pp, b: cg(
        lambda z: dia_matvec(offs, pp["vals"][-1], z), b,
        M=lambda r: mg.apply(pp, r), maxiter=100, tol=TOL))
    x, k, res = solve(pp, b)
    bn = float(jnp.linalg.norm(b))
    assert float(res) <= TOL * bn * 1.5
    k0 = list(np.asarray(offs)).index(0)
    dinv = jnp.where(jnp.abs(Vf[k0]) > 1e-30, 1.0 / Vf[k0], 1.0)
    xj, kj, rj = cg(lambda z: dia_matvec(offs, Vf, z), b,
                    M=lambda r: dinv * r, maxiter=2000, tol=TOL)
    assert int(k) < int(kj) / 2, (int(k), int(kj))
    # solution agreement at the converged tolerance
    nrm = float(jnp.linalg.norm(xj)) or 1.0
    assert float(jnp.linalg.norm(x - xj)) / nrm < 1e-5


def test_latticemg_rejects_non_nesting():
    with pytest.raises(ValueError):
        LatticeDIAMG([[0], [0]], [5, 10], dim=3)


def _dense_dia(A):
    """Full DIA value table (all 2n-1 offsets) for a dense matrix A,
    matching prepare()'s convention V[k][i] = A[i, i+offset]."""
    n = A.shape[0]
    offs = list(range(-(n - 1), n))
    V = np.zeros((len(offs), n))
    for k, o in enumerate(offs):
        i = np.arange(max(0, -o), min(n, n - o))
        V[k][i] = A[i, i + o]
    return offs, V


def test_newton_schulz_guard_and_host_fallback():
    """The TPU-only Newton-Schulz coarse-inverse branch (force_ns=True runs
    it on CPU): on a well-conditioned operator it converges to f64 accuracy;
    on a coarse system beyond f32 conditioning the monotone safeguard keeps
    the reported residual honest (no silent r^8 blow-up) and prepare_safe
    substitutes the host f64 inverse (advisor round-4 medium finding)."""
    # well-conditioned: Newton-Schulz refines the f32 seed to ~f64 accuracy
    n = 65
    L = (np.diag(2.0 * np.ones(n)) + np.diag(-np.ones(n - 1), 1)
         + np.diag(-np.ones(n - 1), -1))
    mg3 = LatticeDIAMG([[-1, 0, 1]], [n], dim=1)
    sub = np.zeros(n)
    sub[1:] = np.diagonal(L, -1)
    sup = np.zeros(n)
    sup[:-1] = np.diagonal(L, 1)
    vals = np.stack([sub, np.diagonal(L).copy(), sup])
    pg = mg3.prepare(mg3.params([vals], dtype=jnp.float64), force_ns=True)
    assert float(pg["ainv0_res"]) < 1e-8
    x = np.asarray(pg["ainv0"]) @ (L @ np.ones(n))
    assert np.allclose(x, np.ones(n), atol=1e-6)

    # Hilbert matrix n=9: cond ~ 5e11, far beyond an f32 factorization —
    # the seed has ||I - A0 X0|| >> 1 and Newton-Schulz DIVERGES; the
    # monotone guard must report that instead of silently amplifying
    nh = 9
    H = 1.0 / (np.arange(nh)[:, None] + np.arange(nh)[None, :] + 1.0)
    offs, Vh = _dense_dia(H)
    mgh = LatticeDIAMG([offs], [nh], dim=1)
    params_bad = mgh.params([Vh], dtype=jnp.float64)
    pb = mgh.prepare(params_bad, force_ns=True)
    assert not (float(pb["ainv0_res"]) < 1e-3), float(pb["ainv0_res"])

    # prepare_safe detects the bad residual and falls back to host f64
    ps = mgh.prepare_safe(params_bad, force_ns=True)
    assert ps.get("ainv0_host_fallback") is True
    assert float(ps["ainv0_res"]) < 1e-3
    # the host-f64 inverse solves to f64-factorization accuracy
    xe = np.sin(np.arange(nh))
    x = np.asarray(ps["ainv0"]) @ (H @ xe)
    assert np.linalg.norm(x - xe) / np.linalg.norm(xe) < 1e-2


def test_prepare_safe_no_fallback_on_good_system(hierarchy):
    """prepare_safe on the real hierarchy keeps the device inverse."""
    levs, mg, _ = hierarchy
    params = mg.params([lv[2] for lv in levs], dtype=jnp.float64)
    pp = mg.prepare_safe(params)
    assert "ainv0_host_fallback" not in pp
    assert float(pp["ainv0_res"]) < 1e-3
