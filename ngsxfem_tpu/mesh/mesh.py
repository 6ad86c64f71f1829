"""Structure-of-arrays tensor meshes.

TPU-first replacement for NGSolve's ``MeshAccess``/``ElementTransformation``
object graph that the reference builds on (see SURVEY.md L-map): the mesh is a
set of flat arrays — vertices ``(nv,d)``, element->vertex ``(ne,nvel)``,
facet->vertex, facet<->element adjacency — generated once on the host, then
used by jit-compiled batched kernels.  Geometry maps (including multilinear
QUAD/HEX maps and, later, isoparametric deformations) are evaluated pointwise
in batched form.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from ..config import config
from ..ops.gauss import ET_DIM, ET_NVERT

# local facet -> local vertices, per element type (own convention, documented)
FACET_VERTS = {
    "segm": [(0,), (1,)],
    "trig": [(0, 1), (1, 2), (0, 2)],
    "quad": [(0, 1), (1, 2), (2, 3), (0, 3)],
    "tet": [(1, 2, 3), (0, 2, 3), (0, 1, 3), (0, 1, 2)],
    "hex": [
        (0, 1, 2, 3),
        (4, 5, 6, 7),
        (0, 1, 5, 4),
        (1, 2, 6, 5),
        (3, 2, 6, 7),
        (0, 3, 7, 4),
    ],
}

FACET_ET = {"segm": "point", "trig": "segm", "quad": "segm", "tet": "trig", "hex": "quad"}

# local edges (1D sub-entities), used for H1 dof enumeration diagnostics
EDGE_VERTS = {
    "segm": [(0, 1)],
    "trig": [(0, 1), (1, 2), (0, 2)],
    "quad": [(0, 1), (1, 2), (2, 3), (0, 3)],
    "tet": [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)],
    "hex": [
        (0, 1), (1, 2), (2, 3), (0, 3),
        (4, 5), (5, 6), (6, 7), (4, 7),
        (0, 4), (1, 5), (2, 6), (3, 7),
    ],
}


class Region:
    """A named element subset of a mesh (NGSolve ``Region`` analog, VOL
    only): the result of ``mesh.Materials(pattern)``.  Carries the element
    mask and the matched material names."""

    def __init__(self, mesh, mask, names):
        self.mesh = mesh
        self.mask = np.asarray(mask, dtype=bool)
        self.names = tuple(names)

    def VB(self):
        return "VOL"

    def Mask(self):
        return self.mask

    def __repr__(self):
        return f"Region(VOL, {'|'.join(self.names)})"


class Mesh:
    """A single-element-type unstructured mesh held as flat arrays.

    ``Mesh(other_mesh)`` is an identity passthrough, so the reference
    idiom ``Mesh(geo.GenerateMesh(maxh=...))`` (py_tutorials/cutfem.py:85)
    works verbatim with :class:`~ngsxfem_tpu.mesh.splinegeom.SplineGeometry`.
    """

    def __new__(cls, et=None, *args, **kwargs):
        if isinstance(et, Mesh) and not args and not kwargs:
            return et
        return super().__new__(cls)

    def __init__(self, et: str, vertices: np.ndarray = None,
                 elements: np.ndarray = None,
                 bc_of_facet=None, bc_names=None, mat_of_el=None,
                 mat_names=None):
        if isinstance(et, Mesh):
            return  # passthrough: already constructed
        self.et = et
        self.dim = ET_DIM[et]
        self.nvel = ET_NVERT[et]
        self.vertices_np = np.asarray(vertices, dtype=np.float64)
        self.elements_np = np.asarray(elements, dtype=np.int32)
        self.nv = self.vertices_np.shape[0]
        self.ne = self.elements_np.shape[0]
        self._build_facets()
        # bc ids per boundary facet (1-based like NGSolve); 0 = interior
        if bc_of_facet is None:
            bc_of_facet = np.where(self.facet2el_np[:, 1] < 0, 1, 0).astype(np.int32)
        self.bc_of_facet_np = np.asarray(bc_of_facet, dtype=np.int32)
        self.bc_names = bc_names or {}
        # material ids per element (1-based like NGSolve; reference passes
        # region_wise through to NGSolve materials, python/__init__.py:358)
        if mat_of_el is None:
            mat_of_el = np.ones(self.ne, dtype=np.int32)
        self.mat_of_el_np = np.asarray(mat_of_el, dtype=np.int32)
        if self.mat_of_el_np.shape != (self.ne,):
            raise ValueError("mat_of_el must be (ne,)")
        self.mat_names = dict(mat_names) if mat_names else {}
        # periodic facet identification (boundary facet -> partner facet on
        # the opposite periodic side, -1 if none); set by mesh builders with
        # periodic=..., consumed by the facet set algebra
        # (GetFacetsWithNeighborTypes / GetElementsWithNeighborFacets,
        # mirroring MeshAccess::GetPeriodicFacet in xfem/cutinfo.cpp:226-235)
        self.periodic_facet_np = np.full(self.nfacets, -1, dtype=np.int64)
        # device arrays
        self.vertices = jnp.asarray(self.vertices_np, dtype=config.dtype)
        self.elements = jnp.asarray(self.elements_np)
        self.facets = jnp.asarray(self.facets_np)
        self.facet2el = jnp.asarray(self.facet2el_np)
        self.el2facet = jnp.asarray(self.el2facet_np)
        # deformation slot (set by SetDeformation); a GridFunction of a vector
        # space or None.  Geometry maps consult this.
        self.deformation = None
        self._version = 0  # bumped when deformation is (un)set

    # -- topology ----------------------------------------------------------
    def _build_facets(self):
        fv = np.array(FACET_VERTS[self.et], dtype=np.int32)  # (nfel, nvf)
        nfel, nvf = fv.shape
        from .native import build_facets as native_build

        out = native_build(self.elements_np, fv)
        if out is not None:
            self.facets_np, self.el2facet_np, self.facet2el_np, self.facet2elloc_np = out
            self.nfacets = self.facets_np.shape[0]
            self.boundary_facets_np = np.nonzero(
                self.facet2el_np[:, 1] < 0
            )[0].astype(np.int32)
            return
        # all facets with duplicates: (ne*nfel, nvf)
        allf = self.elements_np[:, fv.reshape(-1)].reshape(self.ne, nfel, nvf)
        key = np.sort(allf.reshape(-1, nvf), axis=1)
        uniq, inv = np.unique(key, axis=0, return_inverse=True)
        nf = uniq.shape[0]
        self.nfacets = nf
        # keep un-sorted vertex order of the first occurrence for orientation
        first = np.full(nf, -1, dtype=np.int64)
        flat = allf.reshape(-1, nvf)
        order = np.arange(flat.shape[0])
        # reverse iterate so first occurrence wins
        first[inv[::-1]] = order[::-1]
        self.facets_np = flat[first].astype(np.int32)
        self.el2facet_np = inv.reshape(self.ne, nfel).astype(np.int32)
        f2e = np.full((nf, 2), -1, dtype=np.int32)
        f2eloc = np.full((nf, 2), -1, dtype=np.int32)
        for e in range(self.ne):
            for lf in range(nfel):
                f = self.el2facet_np[e, lf]
                s = 0 if f2e[f, 0] < 0 else 1
                f2e[f, s] = e
                f2eloc[f, s] = lf
        self.facet2el_np = f2e
        self.facet2elloc_np = f2eloc
        self.boundary_facets_np = np.nonzero(f2e[:, 1] < 0)[0].astype(np.int32)

    # -- material regions ----------------------------------------------------
    def material_ids(self):
        """Ascending material ids: every id carried by an element PLUS every
        id declared in ``mat_names`` (NGSolve lists declared-but-empty
        materials too — region_wise output is indexed by this order)."""
        ids = set(int(i) for i in np.unique(self.mat_of_el_np))
        ids |= set(int(i) for i in self.mat_names)
        return sorted(ids)

    def GetMaterials(self):
        """Material names in ascending id order (unnamed ids get
        ``"mat<i>"``), NGSolve ``mesh.GetMaterials()`` analog; includes
        declared-but-empty materials."""
        return tuple(self.mat_names.get(i, f"mat{i}")
                     for i in self.material_ids())

    def Materials(self, pattern):
        """Element :class:`Region` of the materials whose name fully
        matches the regex ``pattern`` (NGSolve semantics; ``"a|b"``
        unions)."""
        import re

        names = {i: self.mat_names.get(i, f"mat{i}")
                 for i in self.material_ids()}
        sel = [i for i, nm in names.items() if re.fullmatch(pattern, nm)]
        mask = np.isin(self.mat_of_el_np, np.asarray(sel, dtype=np.int32))
        return Region(self, mask, [names[i] for i in sel])

    def GetBoundaries(self):
        """Boundary-condition names in ascending id order (``"bc<i>"`` for
        unnamed ids), NGSolve ``mesh.GetBoundaries()`` analog."""
        ids = np.unique(self.bc_of_facet_np[self.boundary_facets_np])
        return tuple(self.bc_names.get(int(i), f"bc{int(i)}")
                     for i in ids if i > 0)

    # -- refinement ----------------------------------------------------------
    def Refine(self, marks=None):
        """Refine marked elements in place (uniform if no marks and none
        stored via RefineAtLevelSet/MarkForRefinement).  Trig meshes:
        longest-edge red/green/blue subdivision; tet meshes: Rivara
        longest-edge bisection — both with conformity closure; quad/hex
        meshes: uniform 1->4 / 1->8 tensor refinement (adaptive would hang
        nodes — netgen's restriction too) (mesh/refine.py);
        spaces/GridFunctions must be rebuilt afterwards."""
        from .refine import refine_mesh

        if marks is None:
            marks = getattr(self, "_refine_marks", None)
        return refine_mesh(self, marks)

    def SetRefinementFlags(self, marks):
        """Store per-element refinement flags for the next Refine() call
        (netgen-flag analog used by RefineAtLevelSet/MarkForRefinement)."""
        import numpy as _np

        self._refine_marks = _np.asarray(
            marks.np if hasattr(marks, "np") else marks, dtype=bool)

    # -- deformation -------------------------------------------------------
    def SetDeformation(self, deformation):
        """Apply a (vector) GridFunction as mesh deformation, cf. the
        reference's ``mesh.SetDeformation`` used after lsetcurving
        (``lsetcurving/lsetcurv.py`` usage in tutorials)."""
        self.deformation = deformation
        self._version += 1

    def UnsetDeformation(self):
        self.deformation = None
        self._version += 1

    def __repr__(self):
        return f"Mesh(et={self.et}, nv={self.nv}, ne={self.ne}, nfacets={self.nfacets})"


# -- geometry shape functions (vertex / Q1-P1 maps) ------------------------

def geom_shapes(et: str, pts, xp=jnp):
    """Vertex shape functions N (..., nv) at reference points pts (..., d).

    `xp` selects the array backend (jnp inside jit; np for host-side setup
    paths — eager op dispatch is expensive on single-core hosts)."""
    if et == "segm":
        x = pts[..., 0]
        return xp.stack([1 - x, x], axis=-1)
    if et == "trig":
        x, y = pts[..., 0], pts[..., 1]
        return xp.stack([1 - x - y, x, y], axis=-1)
    if et == "quad":
        x, y = pts[..., 0], pts[..., 1]
        return xp.stack([(1 - x) * (1 - y), x * (1 - y), x * y, (1 - x) * y], axis=-1)
    if et == "tet":
        x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
        return xp.stack([1 - x - y - z, x, y, z], axis=-1)
    if et == "hex":
        x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
        return xp.stack(
            [
                (1 - x) * (1 - y) * (1 - z),
                x * (1 - y) * (1 - z),
                x * y * (1 - z),
                (1 - x) * y * (1 - z),
                (1 - x) * (1 - y) * z,
                x * (1 - y) * z,
                x * y * z,
                (1 - x) * y * z,
            ],
            axis=-1,
        )
    raise ValueError(et)


def geom_dshapes(et: str, pts, xp=jnp):
    """d(N)/d(ref) (..., nv, d) at reference points pts (..., d)."""
    one = xp.ones_like(pts[..., 0])
    zero = xp.zeros_like(one)
    if et == "segm":
        return xp.stack([xp.stack([-one], -1), xp.stack([one], -1)], axis=-2)
    if et == "trig":
        g = xp.stack(
            [
                xp.stack([-one, -one], -1),
                xp.stack([one, zero], -1),
                xp.stack([zero, one], -1),
            ],
            axis=-2,
        )
        return g
    if et == "quad":
        x, y = pts[..., 0], pts[..., 1]
        return xp.stack(
            [
                xp.stack([-(1 - y), -(1 - x)], -1),
                xp.stack([(1 - y), -x], -1),
                xp.stack([y, x], -1),
                xp.stack([-y, (1 - x)], -1),
            ],
            axis=-2,
        )
    if et == "tet":
        return xp.stack(
            [
                xp.stack([-one, -one, -one], -1),
                xp.stack([one, zero, zero], -1),
                xp.stack([zero, one, zero], -1),
                xp.stack([zero, zero, one], -1),
            ],
            axis=-2,
        )
    if et == "hex":
        x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
        return xp.stack(
            [
                xp.stack([-(1 - y) * (1 - z), -(1 - x) * (1 - z), -(1 - x) * (1 - y)], -1),
                xp.stack([(1 - y) * (1 - z), -x * (1 - z), -x * (1 - y)], -1),
                xp.stack([y * (1 - z), x * (1 - z), -x * y], -1),
                xp.stack([-y * (1 - z), (1 - x) * (1 - z), -(1 - x) * y], -1),
                xp.stack([-(1 - y) * z, -(1 - x) * z, (1 - x) * (1 - y)], -1),
                xp.stack([(1 - y) * z, -x * z, x * (1 - y)], -1),
                xp.stack([y * z, x * z, x * y], -1),
                xp.stack([-y * z, (1 - x) * z, (1 - x) * y], -1),
            ],
            axis=-2,
        )
    raise ValueError(et)


def _det(J):
    d = J.shape[-1]
    if d == 1:
        return J[..., 0, 0]
    if d == 2:
        return J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0]
    if d == 3:
        return (
            J[..., 0, 0] * (J[..., 1, 1] * J[..., 2, 2] - J[..., 1, 2] * J[..., 2, 1])
            - J[..., 0, 1] * (J[..., 1, 0] * J[..., 2, 2] - J[..., 1, 2] * J[..., 2, 0])
            + J[..., 0, 2] * (J[..., 1, 0] * J[..., 2, 1] - J[..., 1, 1] * J[..., 2, 0])
        )
    raise ValueError(d)


def _inv(J, detJ):
    d = J.shape[-1]
    if d == 1:
        return 1.0 / J
    if d == 2:
        a, b, c, dd = J[..., 0, 0], J[..., 0, 1], J[..., 1, 0], J[..., 1, 1]
        inv = jnp.stack(
            [jnp.stack([dd, -b], -1), jnp.stack([-c, a], -1)], axis=-2
        )
        return inv / detJ[..., None, None]
    if d == 3:
        # adjugate / det
        m = J
        c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
        c01 = m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2]
        c02 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
        c10 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
        c11 = m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0]
        c12 = m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]
        c20 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
        c21 = m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1]
        c22 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
        adj = jnp.stack(
            [
                jnp.stack([c00, c01, c02], -1),
                jnp.stack([c10, c11, c12], -1),
                jnp.stack([c20, c21, c22], -1),
            ],
            axis=-2,
        )
        return adj / detJ[..., None, None]
    raise ValueError(d)


def det_and_inv(J):
    detJ = _det(J)
    return detJ, _inv(J, detJ)


def map_points(et: str, elem_coords, ref_pts):
    """Map reference points to physical space.

    elem_coords (E, nv, d) element vertex coordinates (possibly deformed),
    ref_pts (E, Q, d) -> (phys (E,Q,d), J (E,Q,d,d)).
    """
    N = geom_shapes(et, ref_pts)  # (E,Q,nv)
    dN = geom_dshapes(et, ref_pts)  # (E,Q,nv,d)
    phys = jnp.einsum("eqv,evg->eqg", N, elem_coords)
    J = jnp.einsum("eqvd,evg->eqgd", dN, elem_coords)
    return phys, J
