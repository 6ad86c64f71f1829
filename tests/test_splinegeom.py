"""SplineGeometry 2D meshing (netgen.geom2d analog, mesh/splinegeom.py).

Covers the reference tutorials' meshing idiom (py_tutorials/cutfem.py:83-85
``SplineGeometry; AddRectangle; Mesh(geo.GenerateMesh(maxh, quad_dominated
=False))``), circle-exact spline3 arcs, multi-domain material regions with
conforming interfaces, bc naming, and an end-to-end unfitted Integrate on a
generated mesh.
"""

import numpy as np
import pytest

from ngsxfem_tpu import (H1, NEG, POS, GridFunction, Integrate,
                         InterpolateToP1, MakeCircle, Mesh, SplineGeometry,
                         sqrt, x, y)


def _mesh_rect(maxh=0.2):
    sq = SplineGeometry()
    sq.AddRectangle([-1.5, -1.5], [1.5, 1.5], bc=1)
    return Mesh(sq.GenerateMesh(maxh=maxh, quad_dominated=False))


def test_rectangle_mesh_area_and_quality():
    mesh = _mesh_rect()
    assert mesh.et == "trig" and mesh.ne > 100
    area = Integrate(None, cf=1.0, mesh=mesh, order=2)
    assert abs(float(area) - 9.0) < 1e-12
    # triangle quality: no angle below 20 degrees on this convex geometry
    v = mesh.vertices_np[mesh.elements_np]
    mins = []
    for i in range(3):
        a, b, c = v[:, i], v[:, (i + 1) % 3], v[:, (i + 2) % 3]
        u1, u2 = b - a, c - a
        cosv = ((u1 * u2).sum(1) / np.linalg.norm(u1, axis=1)
                / np.linalg.norm(u2, axis=1))
        mins.append(np.degrees(np.arccos(np.clip(cosv, -1, 1))))
    assert np.stack(mins).min() > 20.0


def test_mesh_passthrough_identity():
    sq = SplineGeometry()
    sq.AddRectangle([0, 0], [1, 1], bc=1)
    raw = sq.GenerateMesh(maxh=0.5)
    assert Mesh(raw) is raw


def test_circle_exact_boundary_and_bc_names():
    geo = SplineGeometry()
    MakeCircle(geo, (0.0, 0.0), 1.0, bc="outer")
    mesh = geo.GenerateMesh(maxh=0.15)
    # spline3 arcs sample ON the circle (rational quadratic, w=sin(beta/2))
    bverts = np.unique(mesh.facets_np[mesh.boundary_facets_np])
    r = np.linalg.norm(mesh.vertices_np[bverts], axis=1)
    assert np.abs(r - 1.0).max() < 1e-12
    assert mesh.bc_names == {1: "outer"}
    # area deficit of the inscribed polygon is O(h^2)
    area = float(Integrate(None, cf=1.0, mesh=mesh, order=2))
    assert 0 < np.pi - area < 0.02


def test_two_domain_materials_conforming_interface():
    g = SplineGeometry()
    g.AddRectangle([-1, -1], [1, 1], bc="wall", leftdomain=1)
    g.AddCircle((0.0, 0.0), 0.5, bc="interface", leftdomain=2, rightdomain=1)
    g.SetMaterial(1, "outer")
    g.SetMaterial(2, "inner")
    m = g.GenerateMesh(maxh=0.1)
    assert m.GetMaterials() == ("outer", "inner")
    a = np.asarray(Integrate(None, cf=1.0, mesh=m, order=2,
                             region_wise=True))
    exact_inner = np.pi * 0.25
    assert abs(a.sum() - 4.0) < 1e-12          # total is the exact square
    assert abs(a[1] - exact_inner) < 0.01      # polygon deficit only
    # the material interface is edge-conforming and lies ON the circle
    f2e = m.facet2el_np
    mats = m.mat_of_el_np
    interf = (f2e[:, 1] >= 0) & (mats[f2e[:, 0]]
                                 != mats[np.maximum(f2e[:, 1], 0)])
    assert interf.sum() > 10
    vids = np.unique(m.facets_np[interf])
    r = np.linalg.norm(m.vertices_np[vids], axis=1)
    assert np.abs(r - 0.5).max() < 1e-12


def test_boundary_edges_conform_and_carry_bc():
    mesh = _mesh_rect(maxh=0.25)
    bf = mesh.boundary_facets_np
    assert len(bf) > 0
    assert (mesh.bc_of_facet_np[bf] == 1).all()
    # every boundary vertex on the rectangle outline
    bverts = np.unique(mesh.facets_np[bf])
    p = mesh.vertices_np[bverts]
    on_outline = (np.isclose(np.abs(p[:, 0]), 1.5)
                  | np.isclose(np.abs(p[:, 1]), 1.5))
    assert on_outline.all()


def test_quad_dominated_raises():
    sq = SplineGeometry()
    sq.AddRectangle([0, 0], [1, 1], bc=1)
    with pytest.raises(NotImplementedError):
        sq.GenerateMesh(maxh=0.5, quad_dominated=True)


def test_unfitted_integrate_on_generated_mesh():
    """The reference nxfem.py pipeline start: SplineGeometry rectangle,
    P1-interpolated level set, cut-domain Integrate."""
    mesh = _mesh_rect(maxh=0.2)
    ls = GridFunction(H1(mesh, order=1))
    InterpolateToP1(sqrt(x * x + y * y) - 1.0, ls)
    a_neg = float(Integrate({"levelset": ls, "domain_type": NEG},
                            cf=1.0, mesh=mesh, order=3))
    a_pos = float(Integrate({"levelset": ls, "domain_type": POS},
                            cf=1.0, mesh=mesh, order=3))
    assert abs(a_neg - np.pi) < 0.05           # P1 geometry error
    assert abs(a_neg + a_pos - 9.0) < 1e-10    # NEG+POS partitions exactly
