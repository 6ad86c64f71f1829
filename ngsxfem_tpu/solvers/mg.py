"""CutFEM geometric multigrid.

Re-design of the reference prototype (``utils/xprolongation.*`` P1/P2
prolongations, ``python/cutmg.py`` MultiGridCL / CutFemSmoother /
LinearMGIterator): prolongation matrices are built by evaluating the coarse
basis at fine dof nodes (covers P1 and higher orders uniformly — the
reference's separate P1/P2/P2Cut classes collapse into one construction);
the V-cycle runs on device with damped-Jacobi smoothing plus an optional
interface-dof block correction (the CutFemSmoother idea, cutmg.py:61-111).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import config
from .sparse import SparseMatrix


def mesh_hierarchy(make_mesh, nx0: int, levels: int):
    """Meshes [coarse..fine] from a structured generator make_mesh(nx)."""
    return [make_mesh(nx0 * 2**l) for l in range(levels)]


def prolongation_matrix(coarse_space, fine_space) -> SparseMatrix:
    """P: coarse dofs -> fine dofs, by coarse-basis evaluation at fine nodes.

    Works for nested structured meshes of any (equal) order; the analog of
    P1Prolongation/P2Prolongation (utils/xprolongation.hpp:13-101).
    """
    from ..fem.basis import shapes, lagrange_element
    from ..mesh.mesh import geom_shapes

    cm, fm = coarse_space.mesh, fine_space.mesh
    # fine dof node physical coords
    b = lagrange_element(fm.et, fine_space.order)
    N = geom_shapes(fm.et, b["nodes"], xp=np)  # (ndl, nv)
    fnodes = np.einsum("lv,evd->eld", N, fm.vertices_np[fm.elements_np])
    pts = np.zeros((fine_space.ndof, fm.dim))
    pts[fine_space.el2dof_np.reshape(-1)] = fnodes.reshape(-1, fm.dim)

    # locate each fine node in a coarse element (nested structured grids:
    # brute force over coarse elements in a bounding-box prefilter)
    cverts = cm.vertices_np[cm.elements_np]  # (nec, nv, d)
    lo = cverts.min(axis=1)
    hi = cverts.max(axis=1)
    owner = np.full(fine_space.ndof, -1, dtype=np.int64)
    tol = 1e-9 * (cm.vertices_np.max() - cm.vertices_np.min() + 1)
    # simple spatial hash on coarse element bounding boxes
    for e in range(cm.ne):
        inside = np.all((pts >= lo[e] - tol) & (pts <= hi[e] + tol), axis=1)
        cand = np.nonzero(inside & (owner < 0))[0]
        if len(cand) == 0:
            continue
        # local coords via least squares on the (multi)linear map
        loc = _invert_geom(cm.et, cverts[e], pts[cand])
        ok = np.all((loc > -1e-8) & (loc < 1 + 1e-8), axis=1)
        if cm.et in ("trig", "tet"):
            ok &= loc.sum(axis=1) < 1 + 1e-8
        owner[cand[ok]] = e
    if (owner < 0).any():
        raise RuntimeError("prolongation: fine node outside coarse mesh")

    locs = _invert_geom_batched(cm, owner, pts)
    # coarse basis values at the fine nodes
    B = np.asarray(shapes(cm.et, coarse_space.order, jnp.asarray(locs)[:, None, :]))[:, 0]
    cdofs = coarse_space.el2dof_np[owner]  # (nf, ndl)
    rows = np.repeat(np.arange(fine_space.ndof), cdofs.shape[1])
    cols = cdofs.reshape(-1)
    vals = B.reshape(-1)
    keep = np.abs(vals) > 1e-12
    return SparseMatrix(rows[keep], cols[keep], jnp.asarray(vals[keep],
                        dtype=config.dtype),
                        (fine_space.ndof, coarse_space.ndof))


def _invert_geom(et, verts, pts):
    """Local coords of physical pts in one element (affine exact; Newton for
    multilinear quads/hexes)."""
    d = pts.shape[1]
    v0 = verts[0]
    if et in ("trig", "tet", "segm"):
        E = (verts[1:d + 1] - v0).T
        return np.linalg.solve(E, (pts - v0).T).T
    # quad/hex: Newton from center
    loc = np.full_like(pts, 0.5)
    from ..mesh.mesh import geom_shapes, geom_dshapes

    for _ in range(20):
        N = geom_shapes(et, loc, xp=np)
        dN = geom_dshapes(et, loc, xp=np)
        cur = np.einsum("pv,vd->pd", N, verts)
        J = np.einsum("pvd,vg->pgd", dN, verts)
        loc = loc + np.linalg.solve(J, (pts - cur)[..., None])[..., 0]
    return loc


def _invert_geom_batched(cm, owner, pts):
    locs = np.zeros_like(pts)
    cverts = cm.vertices_np[cm.elements_np]
    for e in np.unique(owner):
        sel = owner == e
        locs[sel] = _invert_geom(cm.et, cverts[e], pts[sel])
    return locs


class CutFemSmoother:
    """Damped Jacobi + optional interface-dof block correction
    (cutmg.py:61-111)."""

    def __init__(self, A: SparseMatrix, freedofs=None, if_dofs=None,
                 damping=0.6, if_correction=True):
        self.A = A
        self.damping = damping
        diag = np.asarray(A.diagonal())
        free = np.ones(A.shape[0], bool) if freedofs is None else np.asarray(
            freedofs.np if hasattr(freedofs, "np") else freedofs)
        dinv = np.where((np.abs(diag) > 1e-30) & free, 1.0 / np.where(diag == 0, 1, diag), 0.0)
        self.dinv = jnp.asarray(dinv, dtype=config.dtype)
        self.free = jnp.asarray(free)
        self.ifsolve = None
        if if_correction and if_dofs is not None:
            idx = np.nonzero(np.asarray(if_dofs.np if hasattr(if_dofs, "np")
                                        else if_dofs) & free)[0]
            if len(idx):
                Ad = np.asarray(A.todense())
                Aff = Ad[np.ix_(idx, idx)]
                self.ifsolve = (idx, jnp.asarray(np.linalg.inv(Aff),
                                                 dtype=config.dtype))

    def smooth(self, x, b, steps=2):
        for _ in range(steps):
            r = b - self.A.matvec(x)
            x = x + self.damping * self.dinv * r
        if self.ifsolve is not None:
            idx, Ainv = self.ifsolve
            r = b - self.A.matvec(x)
            x = x.at[jnp.asarray(idx)].add(Ainv @ r[jnp.asarray(idx)])
        return x


class MultiGridCL:
    """V-cycle preconditioner over a space hierarchy (cutmg.py:17-57)."""

    def __init__(self, mats, prols, smoothers, coarse_freedofs=None,
                 nsmooth=2):
        self.mats = mats  # [coarse..fine]
        self.prols = prols  # prols[l]: level l -> level l+1
        self.smoothers = smoothers  # per level (None on the coarsest)
        self.nsmooth = nsmooth
        A0 = np.asarray(mats[0].todense())
        free = (np.ones(A0.shape[0], bool) if coarse_freedofs is None
                else np.asarray(coarse_freedofs.np
                                if hasattr(coarse_freedofs, "np")
                                else coarse_freedofs))
        idx = np.nonzero(free)[0]
        inv = np.zeros_like(A0)
        inv[np.ix_(idx, idx)] = np.linalg.inv(A0[np.ix_(idx, idx)])
        self.coarse_inv = jnp.asarray(inv, dtype=config.dtype)

    def _cycle(self, l, b):
        if l == 0:
            return self.coarse_inv @ b
        A, P, S = self.mats[l], self.prols[l - 1], self.smoothers[l]
        x = S.smooth(jnp.zeros_like(b), b, self.nsmooth)
        r = b - A.matvec(x)
        rc = P.T.matvec(r)
        xc = self._cycle(l - 1, rc)
        x = x + P.matvec(xc)
        x = S.smooth(x, b, self.nsmooth)
        return x

    def __call__(self, b):
        return self._cycle(len(self.mats) - 1, jnp.asarray(b))

    def matvec(self, b):
        return self(b)


def CompoundProlongation(prols):
    """Block-diagonal prolongation for compound spaces (reference
    utils/python_utils.cpp:277-293): apply per-component prolongations."""

    class _CP:
        def __init__(self, ps):
            self.ps = ps

        def matvec(self, x):
            outs, off = [], 0
            for P in self.ps:
                nc = P.shape[1]
                outs.append(P.matvec(x[off:off + nc]))
                off += nc
            return jnp.concatenate(outs)

    return _CP(prols)


class LinearMGIterator:
    """Stationary MG iteration / solver driver (cutmg.py:115+): repeatedly
    applies the V-cycle preconditioned richardson/CG update."""

    def __init__(self, mgpre: MultiGridCL, mat, freedofs=None, maxit=50,
                 tol=1e-8):
        self.mg = mgpre
        self.mat = mat
        self.freedofs = freedofs
        self.maxit = maxit
        self.tol = tol

    def __mul__(self, rhs):
        from .krylov import cg, masked_matvec

        b = jnp.asarray(rhs)
        mv = self.mat.matvec
        M = self.mg
        if self.freedofs is not None:
            import numpy as np

            fm = jnp.asarray(np.asarray(
                self.freedofs.np if hasattr(self.freedofs, "np") else self.freedofs))
            mv = masked_matvec(mv, fm)
            b = jnp.where(fm, b, 0.0)
            M = lambda r: jnp.where(fm, self.mg(r), r)
        x, k, res = cg(mv, b, M=M, maxiter=self.maxit, tol=self.tol)
        return x
