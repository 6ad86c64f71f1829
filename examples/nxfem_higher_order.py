"""High-order isoparametric unfitted interface problem, XFEM formulation.

Port of the reference tutorial ``py_tutorials/nxfem_higher_order.py``:
H1 + XFESpace enrichment (the tutorial's ``FESpace([Vh, Vhx])``) with
LevelSetMeshAdaptation so accuracy scales as O(h^{k+1}).  The CutFEM
(two-copies-of-H1) variant of the same problem lives in cutfem.py.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples import nxfem


def run(nx=15, order=3, verbose=True):
    return nxfem.run(nx=nx, order=order, verbose=verbose, deform=True)


if __name__ == "__main__":
    import math

    errs = [run(nx, verbose=True) for nx in (8, 16)]
    eoc = math.log(errs[0] / errs[1]) / math.log(2)
    print(f"eoc: {eoc:.2f}")
    assert errs[1] < 0.0004, errs
