"""XFESpace structural tests (port of tests/pytests/test_xfes_ndof.py ideas)
plus a formulation-equivalence cross-check: the XFEM (enrichment) and CutFEM
(two-field) formulations span the same discrete space, so the Nitsche
interface solves must agree to solver precision.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngsxfem_tpu import (
    IF, H1, XFESpace, GridFunction, InterpolateToP1, MakeStructured2DMesh,
    CutInfo, sqrt, x, y,
)


@pytest.mark.parametrize("order", [1, 2])
def test_xfes_ndof(order):
    mesh = MakeStructured2DMesh(quads=False, nx=8, ny=8)
    lsetp1 = GridFunction(H1(mesh, order=1))
    InterpolateToP1(sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2) - 0.3, lsetp1)
    Vh = H1(mesh, order=order)
    Vhx = XFESpace(Vh, lsetp1)
    ci = Vhx.GetCutInfo()
    cutels = ci.GetElementsOfType(IF).np
    manual = np.zeros(Vh.ndof, dtype=bool)
    manual[Vh.el2dof_np[cutels].ravel()] = True
    assert Vhx.ndof == manual.sum()
    assert Vhx.ndof > 0
    # each xdof enriches exactly one side
    assert set(np.unique(Vhx.dom_of_xdof)) <= {0, 1}


def test_xfem_equals_cutfem():
    from examples import cutfem, nxfem

    e1 = cutfem.run(nx=10, order=1, verbose=False)
    e2 = nxfem.run(nx=10, order=1, verbose=False)
    assert abs(e1 - e2) < 1e-9, (e1, e2)
