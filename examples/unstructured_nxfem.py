"""Unfitted interface Poisson on unstructured meshes.

The reference's meshing idiom verbatim (py_tutorials/nxfem.py:24-27):
``SplineGeometry().AddRectangle(...)`` + ``Mesh(geo.GenerateMesh(maxh))``,
using the native 2D spline mesher (mesh/splinegeom.py) — plus the "bring
your own mesh" alternatives (Gmsh v2.2 file, raw arrays, or the built-in
Delaunay mesher); the standard CutFEM Nitsche solve runs unchanged.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ngsxfem_tpu import (
    MakeUnstructuredMesh, Mesh, ReadGmsh, SplineGeometry, WriteGmsh,
    MeshFromArrays,
)
from examples import cutfem


def run(npts=900, seed=5, via_gmsh=False, mesher="spline", verbose=True):
    if mesher == "spline":
        # py_tutorials/nxfem.py:24-27 verbatim
        square = SplineGeometry()
        square.AddRectangle([-1.5, -1.5], [1.5, 1.5], bc=1)
        mesh = Mesh(square.GenerateMesh(maxh=0.2, quad_dominated=False))
    else:
        mesh = MakeUnstructuredMesh(
            dim=2, npts=npts, seed=seed,
            mapping=lambda a, b: (3 * a - 1.5, 3 * b - 1.5))
    if via_gmsh:  # round-trip through the Gmsh v2.2 reader
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".msh", delete=False) as f:
            path = f.name
        WriteGmsh(mesh, path)
        mesh = ReadGmsh(path)
        os.unlink(path)
    if verbose:
        print(f"mesh: {mesh} ({'gmsh round-trip' if via_gmsh else mesher})")
    err = cutfem.run(order=1, verbose=verbose, mesh=mesh)
    return err


if __name__ == "__main__":
    err = run(via_gmsh="--gmsh" in sys.argv,
              mesher="delaunay" if "--delaunay" in sys.argv else "spline")
    print("L2 error:", err)
    assert err < 0.06
