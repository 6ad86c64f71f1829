"""High-order isoparametric unfitted interface problem.

Port of the reference tutorial ``py_tutorials/nxfem_higher_order.py``:
the Nitsche interface discretization of nxfem.py/cutfem.py combined with
LevelSetMeshAdaptation so accuracy scales as O(h^{k+1}).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples import cutfem


def run(nx=15, order=3, verbose=True):
    return cutfem.run(nx=nx, order=order, verbose=verbose, deform=True)


if __name__ == "__main__":
    err = run()
    assert err < 0.0004, err
