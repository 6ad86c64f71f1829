"""Structured mesh generators.

API mirrors ``ngsolve.meshes``'s ``Make1DMesh`` / ``MakeStructured2DMesh`` /
``MakeStructured3DMesh`` used throughout the reference test-suite
(e.g. ``tests/pytests/test_straightcutrule.py:47,82``), including the
``mapping`` kwarg for affine/nonlinear box mappings.

Boundary numbering (1-based, NGSolve-like):
  1D: 1=left, 2=right
  2D: 1=bottom (y=0), 2=right (x=1), 3=top (y=1), 4=left (x=0)
  3D: 1=back (y=0), 2=front (y=1), 3=left (x=0), 4=right (x=1),
      5=bottom (z=0), 6=top (z=1)
(evaluated on the unit box *before* `mapping` is applied)
"""
from __future__ import annotations

import numpy as np

from .mesh import Mesh, FACET_VERTS

_BC_NAMES_2D = {1: "bottom", 2: "right", 3: "top", 4: "left"}
_BC_NAMES_3D = {1: "back", 2: "front", 3: "left", 4: "right", 5: "bottom", 6: "top"}


def _facet_bc_from_unitbox(mesh: Mesh, unit_vertices: np.ndarray, dim: int):
    """Assign bc ids to boundary facets from unit-box face membership."""
    tol = 1e-12
    bc = np.zeros(mesh.nfacets, dtype=np.int32)
    for f in mesh.boundary_facets_np:
        vs = unit_vertices[mesh.facets_np[f]]
        if dim == 1:
            bc[f] = 1 if vs[:, 0].max() < tol else 2
        elif dim == 2:
            if np.all(vs[:, 1] < tol):
                bc[f] = 1
            elif np.all(vs[:, 0] > 1 - tol):
                bc[f] = 2
            elif np.all(vs[:, 1] > 1 - tol):
                bc[f] = 3
            elif np.all(vs[:, 0] < tol):
                bc[f] = 4
        else:
            if np.all(vs[:, 1] < tol):
                bc[f] = 1
            elif np.all(vs[:, 1] > 1 - tol):
                bc[f] = 2
            elif np.all(vs[:, 0] < tol):
                bc[f] = 3
            elif np.all(vs[:, 0] > 1 - tol):
                bc[f] = 4
            elif np.all(vs[:, 2] < tol):
                bc[f] = 5
            elif np.all(vs[:, 2] > 1 - tol):
                bc[f] = 6
    return bc


def Make1DMesh(n: int, mapping=None):
    xs = np.linspace(0.0, 1.0, n + 1)
    unit_vertices = xs[:, None].copy()
    verts = unit_vertices.copy()
    if mapping is not None:
        verts = np.array([[mapping(v[0])] for v in verts], dtype=np.float64)
    elems = np.stack([np.arange(n), np.arange(n) + 1], axis=1).astype(np.int32)
    m = Mesh("segm", verts, elems)
    m.bc_of_facet_np = _facet_bc_from_unitbox(m, unit_vertices, 1)
    m.bc_names = {1: "left", 2: "right"}
    return m


def _periodic_identify(m, unit_vertices, periodic):
    """Match opposite unit-box boundary facets for the axes named in
    ``periodic`` (e.g. "x", "xy"); fills mesh.periodic_facet_np."""
    d = unit_vertices.shape[1]
    bf = m.boundary_facets_np
    centers = unit_vertices[m.facets_np[bf]].mean(axis=1)  # (B, d)
    for ax, ch in enumerate("xyz"[:d]):
        if ch not in periodic:
            continue
        lo = np.abs(centers[:, ax]) < 1e-12
        hi = np.abs(centers[:, ax] - 1.0) < 1e-12
        key = np.round(np.delete(centers, ax, axis=1) * 2.0**40).astype(np.int64)
        lom = {tuple(k): int(f) for k, f in zip(key[lo], bf[lo])}
        for k, f in zip(key[hi], bf[hi]):
            p = lom[tuple(k)]
            m.periodic_facet_np[p] = f
            m.periodic_facet_np[f] = p
    m.periodic_axes = periodic


def MakeStructured2DMesh(quads=True, nx=10, ny=10, mapping=None,
                         periodic=""):
    xs = np.linspace(0.0, 1.0, nx + 1)
    ys = np.linspace(0.0, 1.0, ny + 1)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    unit_vertices = np.stack([X.ravel(), Y.ravel()], axis=1)
    vid = lambda i, j: i * (ny + 1) + j

    cells = []
    for i in range(nx):
        for j in range(ny):
            v00, v10 = vid(i, j), vid(i + 1, j)
            v11, v01 = vid(i + 1, j + 1), vid(i, j + 1)
            if quads:
                cells.append((v00, v10, v11, v01))
            else:
                # split each cell along the (v00,v11) diagonal
                cells.append((v00, v10, v11))
                cells.append((v00, v11, v01))
    elems = np.array(cells, dtype=np.int32)
    verts = unit_vertices.copy()
    if mapping is not None:
        mapped = [mapping(v[0], v[1]) for v in verts]
        verts = np.array(mapped, dtype=np.float64)
    m = Mesh("quad" if quads else "trig", verts, elems)
    m.bc_of_facet_np = _facet_bc_from_unitbox(m, unit_vertices, 2)
    m.bc_names = _BC_NAMES_2D
    if periodic:
        _periodic_identify(m, unit_vertices, periodic)
    return m


def MakeStructured3DMesh(hexes=True, nx=10, ny=10, nz=10, mapping=None,
                         periodic=""):
    xs = np.linspace(0.0, 1.0, nx + 1)
    ys = np.linspace(0.0, 1.0, ny + 1)
    zs = np.linspace(0.0, 1.0, nz + 1)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    unit_vertices = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)
    vid = lambda i, j, k: (i * (ny + 1) + j) * (nz + 1) + k

    cells = []
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                # hex vertex order (0,0,0),(1,0,0),(1,1,0),(0,1,0), then z+1
                c = [
                    vid(i, j, k),
                    vid(i + 1, j, k),
                    vid(i + 1, j + 1, k),
                    vid(i, j + 1, k),
                    vid(i, j, k + 1),
                    vid(i + 1, j, k + 1),
                    vid(i + 1, j + 1, k + 1),
                    vid(i, j + 1, k + 1),
                ]
                if hexes:
                    cells.append(tuple(c))
                else:
                    # Kuhn 6-tet split of the cell (all share diagonal c0-c6)
                    for tet in (
                        (0, 1, 2, 6),
                        (0, 1, 5, 6),
                        (0, 3, 2, 6),
                        (0, 3, 7, 6),
                        (0, 4, 5, 6),
                        (0, 4, 7, 6),
                    ):
                        cells.append(tuple(c[t] for t in tet))
    elems = np.array(cells, dtype=np.int32)
    verts = unit_vertices.copy()
    if mapping is not None:
        mapped = [mapping(v[0], v[1], v[2]) for v in verts]
        verts = np.array(mapped, dtype=np.float64)
    m = Mesh("hex" if hexes else "tet", verts, elems)
    m.bc_of_facet_np = _facet_bc_from_unitbox(m, unit_vertices, 3)
    m.bc_names = _BC_NAMES_3D
    if periodic:
        _periodic_identify(m, unit_vertices, periodic)
    return m
