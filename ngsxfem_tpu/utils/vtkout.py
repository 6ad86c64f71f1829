"""VTK output + Draw stub (visualization parity).

The reference tutorials end with ``Draw(...)`` / ``VTKOutput(...)``
(e.g. py_tutorials/tracefem3d.py): here ``VTKOutput`` writes legacy ASCII
VTK unstructured grids with point-evaluated CoefficientFunctions (subdivision
via per-element Lagrange nodes), and ``Draw`` is a no-op hook.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import config

_VTK_CELL = {"segm": 3, "trig": 5, "quad": 9, "tet": 10, "hex": 12}


def Draw(*args, **kwargs):
    """No-op (no GUI); use VTKOutput for files."""
    return None


class VTKOutput:
    def __init__(self, ma=None, mesh=None, coefs=(), names=(), filename="out",
                 subdivision=0, **kw):
        self.mesh = ma if ma is not None else mesh
        self.coefs = list(coefs)
        self.names = list(names)
        if len(self.coefs) != len(self.names):
            raise ValueError(
                f"VTKOutput: {len(self.coefs)} coefs but {len(self.names)} "
                "names (zip would silently drop fields)")
        self.filename = filename

    def Do(self, time=None):
        from ..cf.coefficient import wrap
        from ..cf.context import EvalCtx, eval_pure
        from ..ops.cuttables import REF_VERTS

        mesh = self.mesh
        refv = REF_VERTS[mesh.et]
        nvel = refv.shape[0]
        pts = jnp.broadcast_to(
            jnp.asarray(refv, dtype=config.dtype)[None], (mesh.ne,) + refv.shape
        )
        ctx = EvalCtx(mesh, pts)
        phys = np.asarray(ctx.phys)  # (ne, nvel, d) includes deformation
        d = phys.shape[-1]
        npts = mesh.ne * nvel
        fn = f"{self.filename}.vtk"
        with open(fn, "w") as f:
            f.write("# vtk DataFile Version 3.0\nngsxfem_tpu output\nASCII\n")
            f.write("DATASET UNSTRUCTURED_GRID\n")
            f.write(f"POINTS {npts} double\n")
            p3 = np.zeros((npts, 3))
            p3[:, :d] = phys.reshape(-1, d)
            np.savetxt(f, p3, fmt="%.10g")
            f.write(f"\nCELLS {mesh.ne} {mesh.ne * (nvel + 1)}\n")
            conn = np.arange(npts).reshape(mesh.ne, nvel)
            np.savetxt(
                f, np.concatenate([np.full((mesh.ne, 1), nvel), conn], axis=1),
                fmt="%d",
            )
            f.write(f"\nCELL_TYPES {mesh.ne}\n")
            np.savetxt(f, np.full(mesh.ne, _VTK_CELL[mesh.et]), fmt="%d")
            f.write(f"\nPOINT_DATA {npts}\n")
            for cf, name in zip(self.coefs, self.names):
                vals = eval_pure(wrap(cf), ctx)
                vals = np.asarray(jnp.broadcast_to(
                    vals, (mesh.ne, nvel) + wrap(cf).dims))
                if vals.ndim == 2:
                    f.write(f"SCALARS {name} double 1\nLOOKUP_TABLE default\n")
                    np.savetxt(f, vals.reshape(-1, 1), fmt="%.10g")
                else:
                    f.write(f"VECTORS {name} double\n")
                    v3 = np.zeros((npts, 3))
                    v3[:, : vals.shape[-1]] = vals.reshape(npts, -1)
                    np.savetxt(f, v3, fmt="%.10g")
        return fn

    __call__ = Do
