"""Unfitted Stokes (CutFEM Taylor-Hood + Nitsche + ghost penalties):
manufactured divergence-free solution on a disk."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples import stokescutfem


def test_stokes_cutfem():
    uerr, perr = stokescutfem.run(nx=16, verbose=False)
    assert uerr < 0.02, uerr
    assert perr < 0.05, perr


def test_stokes_converges():
    u1, p1 = stokescutfem.run(nx=16, verbose=False)
    u2, p2 = stokescutfem.run(nx=32, verbose=False)
    assert u2 < u1 / 3
    assert p2 < p1 / 2.5


def test_minres_symmetric_indefinite():
    """Device MINRES solves a saddle-point system CG cannot (symmetric
    indefinite): matches the dense direct solve."""
    import numpy as np
    import jax.numpy as jnp
    from ngsxfem_tpu.solvers.krylov import minres

    rng = np.random.default_rng(0)
    A = rng.standard_normal((12, 12))
    A = A + A.T + 14 * np.eye(12)
    B = rng.standard_normal((4, 12))
    K = np.block([[A, B.T], [B, np.zeros((4, 4))]])
    b = rng.standard_normal(16)
    xref = np.linalg.solve(K, b)
    Kj = jnp.asarray(K)
    x, k, rel = minres(lambda v: Kj @ v, jnp.asarray(b),
                       maxiter=400, tol=1e-12)
    assert np.abs(np.asarray(x) - xref).max() < 1e-8
    assert int(k) <= 16 + 1  # Krylov dimension bound

    # preconditioned variant (SPD abs-Jacobi) also converges
    dinv = jnp.asarray(1.0 / np.maximum(np.abs(np.diag(K)), 1e-2))
    xp, kp, _ = minres(lambda v: Kj @ v, jnp.asarray(b),
                       M=lambda r: dinv * r, maxiter=400, tol=1e-12)
    assert np.abs(np.asarray(xp) - xref).max() < 1e-8


def test_stokes_xfem_minres_matches_direct():
    """MinResSolver (device-resident iterative path) reproduces the direct
    solve of the XFEM Stokes saddle-point system to solver tolerance."""
    from examples import stokesxfem

    u_d, p_d = stokesxfem.run(nx=8, verbose=False, solver="direct")
    u_m, p_m = stokesxfem.run(nx=8, verbose=False, solver="minres")
    assert abs(u_m - u_d) < 1e-8 * max(u_d, 1e-30), (u_d, u_m)
    assert abs(p_m - p_d) < 1e-8 * max(p_d, 1e-30), (p_d, p_m)


def test_stokes_xfem():
    """XFEM-formulated Stokes interface problem (port of
    py_tutorials/stokesxfem.py): Kirchhart/Gross/Reusken manufactured
    solution, Hansbo-Nitsche coupling, NumberSpace pressure constraint."""
    from examples import stokesxfem

    u1, p1 = stokesxfem.run(nx=8, verbose=False)
    u2, p2 = stokesxfem.run(nx=16, verbose=False)
    assert u1 < 8e-3 and p1 < 5e-2, (u1, p1)
    assert u2 < u1 / 3, (u1, u2)
    assert p2 < p1 / 2.5, (p1, p2)
