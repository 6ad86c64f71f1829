"""Unfitted interface Poisson on a user-supplied unstructured mesh.

The "bring your own mesh" workflow replacing the reference's Netgen
SplineGeometry meshing (py_tutorials/nxfem.py:24-27): generate or load an
unstructured simplicial mesh (Gmsh v2.2 file, raw arrays, or the built-in
Delaunay mesher), then run the standard CutFEM Nitsche solve unchanged.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ngsxfem_tpu import (
    MakeUnstructuredMesh, ReadGmsh, WriteGmsh, MeshFromArrays,
)
from examples import cutfem


def run(npts=900, seed=5, via_gmsh=False, verbose=True):
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
        print(f"mesh: {mesh} ({'gmsh round-trip' if via_gmsh else 'delaunay'})")
    err = cutfem.run(order=1, verbose=verbose, mesh=mesh)
    return err


if __name__ == "__main__":
    err = run(via_gmsh="--gmsh" in sys.argv)
    print("L2 error:", err)
    assert err < 0.06
