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
