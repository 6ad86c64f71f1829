"""CutFEM multigrid (analog of the reference python/cutmg.py prototype):
MG-preconditioned CG must beat Jacobi-CG and agree on the solution."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples import cutmg


def test_cutmg_accelerates():
    it_mg, it_j, diff = cutmg.run(nx0=8, levels=2, verbose=False)
    assert diff < 1e-7
    assert it_mg < it_j / 2, (it_mg, it_j)
