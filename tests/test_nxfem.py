"""Port of the reference discretization test (tests/pytests/test_nxfem.py):
Nitsche interface Poisson with manufactured solution; L2 thresholds per order
(reference :126-131).  Uses the CutFEM two-field formulation (cf.
py_tutorials/cutfem.py) with isoparametric deformation for k>=2.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples import cutfem


@pytest.mark.parametrize("order,nx,threshold", [
    (1, 20, 0.06),
    (2, 15, 0.004),
    (3, 15, 0.0004),
])
def test_nxfem_thresholds(order, nx, threshold):
    err = cutfem.run(nx=nx, order=order, verbose=False, deform=(order > 1))
    assert err < threshold, f"L2 error {err} >= {threshold}"


def test_fictdom_ghostpen():
    from examples import fictdom_ghostpen

    err = fictdom_ghostpen.run(nx=20, order=1, verbose=False)
    assert err < 0.08, err
