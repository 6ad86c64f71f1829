"""FacetFESpace: facet-wise discontinuous Lagrange space.

The facet-variable space of NGSolve used by the reference's HDG-style cut
formulations (reference ``tests/pytests/test_straightcutrule.py:313-331``:
``FacetFESpace`` + ``GetDofsOfFacets`` + ``element_boundary=True``).  Dofs
live per facet (no inter-facet coupling); an element sees the dofs of all its
facets, and basis functions are facet-Lagrange polynomials supported on one
facet only.

Evaluation model: at element-reference points that lie ON a facet (the rows
produced by element-boundary / skeleton contexts), the basis factor is the
facet-Lagrange shape evaluated at the facet's canonical parametric coordinate,
masked to zero off-facet.  The canonical parametrization is anchored at the
*global* facet vertex order, so the two elements sharing a facet see identical
global basis functions (continuity across the facet without orientation case
analysis).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import config
from ..mesh.mesh import Mesh, FACET_VERTS, FACET_ET
from .basis import lagrange_element, ndof_el, shapes
from .space import FESpace, BitArray


class FacetFESpace(FESpace):
    """Facet-wise polynomials of given order (cf. NGSolve FacetFESpace)."""

    vdim = 1
    is_compound = False

    def __init__(self, mesh: Mesh, order: int = 0, dirichlet=None, **kw):
        self.mesh = mesh
        self.order = int(order)
        self.dgjumps = False
        self.dirichlet_spec = dirichlet
        fet = FACET_ET[mesh.et]
        if fet == "point":
            raise NotImplementedError("FacetFESpace on 1D meshes")
        self.facet_et = fet
        self.ndof_facet = ndof_el(fet, self.order)
        nf = mesh.nfacets
        self.ndof = nf * self.ndof_facet
        self.facet2dof_np = np.arange(self.ndof, dtype=np.int32).reshape(
            nf, self.ndof_facet
        )
        # element dofs: all facets' dofs, ordered by local facet
        e2f = mesh.el2facet_np  # (ne, nfel)
        self.el2dof_np = self.facet2dof_np[e2f].reshape(mesh.ne, -1)
        self.el2dof = jnp.asarray(self.el2dof_np)
        self._build_facet_frames()
        self._apply_dirichlet_facets(dirichlet)

    @property
    def ndof_el(self):
        return self.el2dof_np.shape[1]

    def _build_facet_frames(self):
        """Per (element, local facet): the affine inverse parametrization
        s = A (p - V0) of the facet plane in element-reference coordinates,
        anchored at the global facet vertex order (host precompute)."""
        m = self.mesh
        from ..ops.cuttables import REF_VERTS

        refv = REF_VERTS[m.et]
        d = m.dim
        fv_loc = np.array(FACET_VERTS[m.et], dtype=np.int32)  # (nfel, nvf)
        nfel, nvf = fv_loc.shape
        ne = m.ne
        # global vertex ids of each element's facets, in GLOBAL facet order
        gfacets = m.facets_np[m.el2facet_np]  # (ne, nfel, nvf) canonical order
        els = m.elements_np  # (ne, nvel)
        # local index of each canonical facet vertex within the element
        loc_idx = np.argmax(
            els[:, None, None, :] == gfacets[..., None], axis=-1
        )  # (ne, nfel, nvf)
        loc_ref = refv[loc_idx]  # (ne, nfel, nvf, d)
        V0 = loc_ref[..., 0, :]  # (ne, nfel, d)
        E = loc_ref[..., 1:, :] - V0[..., None, :]  # (ne, nfel, nvf-1, d)
        if self.facet_et == "quad":  # param axes = edges 0->1 and 0->3
            E = np.stack([loc_ref[..., 1, :] - V0, loc_ref[..., 3, :] - V0],
                         axis=-2)
        # pseudo-inverse rows: s = (E E^T)^-1 E (p - V0)
        G = np.einsum("efkd,efld->efkl", E, E)
        A = np.einsum("efkl,efld->efkd", np.linalg.inv(G), E)  # (ne,nfel,d-1,d)
        self._A = jnp.asarray(A, dtype=config.dtype)
        self._V0 = jnp.asarray(V0, dtype=config.dtype)
        # plane residual frame for the on-facet mask
        self._E = jnp.asarray(E, dtype=config.dtype)

    def _apply_dirichlet_facets(self, dirichlet):
        import re

        m = self.mesh
        diri = np.zeros(self.ndof, dtype=bool)
        if dirichlet:
            ids = set()
            if isinstance(dirichlet, str):
                pat = re.compile(dirichlet)
                for bid, name in m.bc_names.items():
                    if pat.fullmatch(name):
                        ids.add(bid)
            else:
                ids = set(int(b) for b in dirichlet)
            for f in m.boundary_facets_np:
                if int(m.bc_of_facet_np[f]) in ids:
                    diri[self.facet2dof_np[f]] = True
        self.dirichlet_dofs = diri

    # -- evaluation hook (forms/evaluate.py proxy_factor) ---------------------
    def proxy_factor_hook(self, proxy, ctx, pctx):
        from ..forms.evaluate import Factor

        if proxy.op != "val":
            raise NotImplementedError(
                f"FacetFESpace supports the value operator only (op={proxy.op})"
            )
        pts = pctx.ref_pts  # (E, Q, d)
        eids = pctx.elem_ids
        A = self._A if eids is None else self._A[eids]  # (E,nfel,d-1,d)
        V0 = self._V0 if eids is None else self._V0[eids]
        nfel = A.shape[1]
        rel = pts[:, :, None, :] - V0[:, None, :, :]  # (E,Q,nfel,d)
        s = jnp.einsum("efkd,eqfd->eqfk", A, rel)  # (E,Q,nfel,d-1)
        # on-facet test: reconstruction residual of the affine frame
        E = self._E if eids is None else self._E[eids]  # (E,nfel,d-1,d)
        rec = jnp.einsum("eqfk,efkd->eqfd", s, E)
        res = jnp.linalg.norm(rel - rec, axis=-1)  # (E,Q,nfel)
        # tolerance scaled by the dtype eps (an absolute 1e-9 is below f32
        # roundoff — the whole facet basis would silently mask to zero)
        tol = max(1e3 * float(jnp.finfo(pts.dtype).eps), 1e-9)
        inside = jnp.all((s > -tol) & (s < 1 + tol), axis=-1)
        if self.facet_et == "trig":
            inside = inside & (jnp.sum(s, axis=-1) < 1 + tol)
        on = (res < tol) & inside  # (E,Q,nfel)
        Eb, Q = pts.shape[0], pts.shape[1]
        Sf = shapes(self.facet_et, self.order,
                    s.reshape(Eb, Q * nfel, -1)).reshape(
            Eb, Q, nfel, self.ndof_facet
        )
        arr = jnp.where(on[..., None], Sf, 0.0).reshape(
            Eb, Q, nfel * self.ndof_facet
        )
        return Factor(block=proxy.block_key, arr=arr, space=proxy.space)


def _facet_interior_local_nodes(space):
    """Per local facet: the NT_FACET node dofs (shared helper,
    fem/basis.facet_local_nodes with interior_only=True)."""
    from .basis import facet_local_nodes

    return facet_local_nodes(space.mesh.et, space.order, interior_only=True)


def GetDofsOfFacets(space, facet_mask) -> BitArray:
    """Dofs associated with marked facets (reference
    ``xfem/cutinfo.cpp:306-329``: GetDofNrs per NT_FACET node).

    Works for any space: FacetFESpace marks all dofs of the facet;
    continuous element spaces (H1) mark the facet-interior Lagrange dofs
    (the NT_FACET node dofs — empty for order 1 on simplices, as in
    NGSolve); discontinuous (dgjumps-free L2) spaces have no facet nodes.
    """
    from .space import CompressedFESpace, _arr, L2

    mask = _arr(facet_mask)
    if isinstance(space, CompressedFESpace):
        inner = GetDofsOfFacets(space.base, mask)
        return BitArray(inner.np[space.comp2base])
    out = np.zeros(space.ndof, dtype=bool)
    if isinstance(space, FacetFESpace):
        dofs = space.facet2dof_np[mask]
        out[dofs.ravel()] = True
        return BitArray(out)
    if isinstance(space, L2):
        return BitArray(out)  # all dofs are element-interior
    lfn = _facet_interior_local_nodes(space)
    m = space.mesh
    fids = np.nonzero(mask)[0]
    e = m.facet2el_np[fids, 0]
    lf = m.facet2elloc_np[fids, 0]
    for loc, ids in enumerate(lfn):
        if len(ids) == 0:
            continue
        sel = lf == loc
        if sel.any():
            out[space.el2dof_np[e[sel]][:, ids].ravel()] = True
    return BitArray(out)
