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
