"""Ports of the remaining reference pytest files not covered verbatim
elsewhere (SURVEY §4 sanctions porting the acceptance contracts):

* tests/pytests/test_localgeom.py — straight-cut measures on a 4-element
  triangulation of the unit triangle, exact to 5e-16*(order+1)^2.
* tests/pytests/test_xfes_ndof.py — XFESpace active-dof counts on the
  reference's exact meshes (2D: 25/7, 3D: 125/35).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_cut_triangle():
    """Reference tests/pytests/test_localgeom.py: unit triangle cut by
    x+y-0.25; meas(NEG)=1/32, meas(POS)=1/2-1/32, exact at every order."""
    from ngsxfem_tpu import (
        MeshFromArrays, H1, GridFunction, InterpolateToP1, Integrate,
        CoefficientFunction, NEG, POS, x, y,
    )

    # midpoint refinement of the unit triangle (the reference's maxh=1
    # netgen mesh also has 4 elements; the measures are mesh-independent)
    verts = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0],
                      [0.5, 0.0], [0.5, 0.5], [0.0, 0.5]])
    els = np.array([[0, 3, 5], [3, 1, 4], [5, 4, 2], [3, 4, 5]])
    mesh = MeshFromArrays("trig", verts, els)

    lsetp1 = GridFunction(H1(mesh, order=1))
    InterpolateToP1(x + y - 0.25, lsetp1)
    lset_neg = {"levelset": lsetp1, "domain_type": NEG, "subdivlvl": 0}
    lset_pos = {"levelset": lsetp1, "domain_type": POS, "subdivlvl": 0}

    one = CoefficientFunction(1.0)
    for order in range(16):
        tol = 5e-16 * (order + 1) * (order + 1)
        m_neg = Integrate(levelset_domain=lset_neg, cf=one, mesh=mesh,
                          order=order)
        m_pos = Integrate(levelset_domain=lset_pos, cf=one, mesh=mesh,
                          order=order)
        assert abs(m_neg - 1.0 / 32.0) < tol
        assert abs(m_pos - 1.0 / 2.0 + 1.0 / 32.0) < tol
        assert abs(m_neg + m_pos - 1.0 / 2.0) < tol


def test_xfes_ndof_2D():
    """Reference tests/pytests/test_xfes_ndof.py (2D)."""
    from ngsxfem_tpu import (
        MakeStructured2DMesh, H1, GridFunction, InterpolateToP1, XFESpace,
        sqrt, x, y,
    )

    mesh = MakeStructured2DMesh(quads=False, nx=4, ny=4,
                                mapping=lambda a, b: (2 * a - 1, 2 * b - 1))
    lsetp1 = GridFunction(H1(mesh, order=1))
    InterpolateToP1(sqrt(x * x + y * y) - 1.0 / 3.0, lsetp1)
    Vh = H1(mesh, order=1, dirichlet=[1, 2, 3, 4])
    Vhx = XFESpace(Vh, lsetp1)
    assert Vh.ndof == 25
    assert Vhx.ndof == 7


def test_xfes_ndof_3D():
    """Reference tests/pytests/test_xfes_ndof.py (3D)."""
    from ngsxfem_tpu import (
        MakeStructured3DMesh, H1, GridFunction, InterpolateToP1, XFESpace,
        sqrt, x, y,
    )

    mesh = MakeStructured3DMesh(
        hexes=False, nx=4, ny=4, nz=4,
        mapping=lambda a, b, c: (2 * a - 1, 2 * b - 1, 2 * c - 1))
    lsetp1 = GridFunction(H1(mesh, order=1))
    InterpolateToP1(sqrt(x * x + y * y) - 1.0 / 3.0, lsetp1)
    Vh = H1(mesh, order=1, dirichlet=[1, 2, 3, 4])
    Vhx = XFESpace(Vh, lsetp1)
    assert Vh.ndof == 125
    assert Vhx.ndof == 35
