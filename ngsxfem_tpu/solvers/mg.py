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

    # locate each fine node in a coarse element: kd-tree over coarse element
    # centroids + vectorized membership test over the k nearest candidates
    # (O(N log N); replaces the per-element host loop, which did not scale)
    from scipy.spatial import cKDTree

    cverts = cm.vertices_np[cm.elements_np]  # (nec, nv, d)
    cents = cverts.mean(axis=1)
    tree = cKDTree(cents)
    k = int(min(cm.ne, 16))
    _, cand = tree.query(pts, k=k)
    cand = cand.reshape(len(pts), k)
    owner = np.full(fine_space.ndof, -1, dtype=np.int64)
    for j in range(k):
        un = np.nonzero(owner < 0)[0]
        if len(un) == 0:
            break
        e = cand[un, j]
        loc = _invert_geom_pp(cm.et, cverts[e], pts[un])
        ok = np.all((loc > -1e-8) & (loc < 1 + 1e-8), axis=1)
        if cm.et in ("trig", "tet"):
            ok &= loc.sum(axis=1) < 1 + 1e-8
        owner[un[ok]] = e[ok]
    if (owner < 0).any():
        raise RuntimeError("prolongation: fine node outside coarse mesh")

    locs = _invert_geom_pp(cm.et, cverts[owner], pts)
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


def _invert_geom_pp(et, verts, pts):
    """Local coords of physical pts, per-point element vertices.

    verts (N, nvel, d), pts (N, d) -> (N, d). Affine exact for simplices;
    batched Newton for multilinear quads/hexes.
    """
    d = pts.shape[1]
    v0 = verts[:, 0]
    if et in ("trig", "tet", "segm"):
        E = np.swapaxes(verts[:, 1:d + 1] - v0[:, None], 1, 2)  # (N, d, d)
        return np.linalg.solve(E, (pts - v0)[..., None])[..., 0]
    # quad/hex: batched Newton from center
    loc = np.full_like(pts, 0.5)
    from ..mesh.mesh import geom_shapes, geom_dshapes

    for _ in range(20):
        N = geom_shapes(et, loc[:, None, :], xp=np)[:, 0]  # (N, nvel)
        dN = geom_dshapes(et, loc[:, None, :], xp=np)[:, 0]  # (N, nvel, d)
        cur = np.einsum("nv,nvd->nd", N, verts)
        J = np.einsum("nvd,nvg->ndg", dN, verts)  # dx_g / dloc_d
        loc = loc + np.linalg.solve(
            np.swapaxes(J, 1, 2), (pts - cur)[..., None])[..., 0]
    return loc


class CutFemSmoother:
    """Damped Jacobi + optional interface-dof block correction
    (cutmg.py:61-111).

    Scale-ready: the interface block is extracted ONCE as its own sparse
    matrix (#if-dofs rows, typically O(sqrt(ndof))) and the correction is an
    inner CG on it — matching the reference's ``ifsolver='cg'`` branch
    (python/cutmg.py:61-111) — instead of a dense inverse.
    """

    def __init__(self, A: SparseMatrix, freedofs=None, if_dofs=None,
                 damping=0.6, if_correction=True, if_maxit=40, if_tol=1e-4):
        self.A = A
        self.damping = damping
        diag = np.asarray(A.diagonal())
        free = np.ones(A.shape[0], bool) if freedofs is None else np.asarray(
            freedofs.np if hasattr(freedofs, "np") else freedofs)
        dinv = np.where((np.abs(diag) > 1e-30) & free, 1.0 / np.where(diag == 0, 1, diag), 0.0)
        self.dinv = jnp.asarray(dinv, dtype=config.dtype)
        self.free = jnp.asarray(free)
        self.ifsolve = None
        self.if_maxit = if_maxit
        self.if_tol = if_tol
        if if_correction and if_dofs is not None:
            idx = np.nonzero(np.asarray(if_dofs.np if hasattr(if_dofs, "np")
                                        else if_dofs) & free)[0]
            if len(idx):
                # extract the interface sub-block as a small SparseMatrix
                S = A.to_scipy().tocsr()[idx][:, idx].tocoo()
                Aff = SparseMatrix(S.row, S.col,
                                   jnp.asarray(S.data, dtype=config.dtype),
                                   (len(idx), len(idx)))
                dsub = np.asarray(Aff.diagonal())
                dsub = np.where(np.abs(dsub) > 1e-30, 1.0 / np.where(dsub == 0, 1, dsub), 0.0)
                self.ifsolve = (jnp.asarray(idx), Aff,
                                jnp.asarray(dsub, dtype=config.dtype))

    def smooth(self, x, b, steps=2):
        from .krylov import cg

        for _ in range(steps):
            r = b - self.A.matvec(x)
            x = x + self.damping * self.dinv * r
        if self.ifsolve is not None:
            idx, Aff, dsub = self.ifsolve
            r = b - self.A.matvec(x)
            z, _, _ = cg(Aff.matvec, r[idx], M=lambda s: dsub * s,
                         maxiter=self.if_maxit, tol=self.if_tol)
            x = x.at[idx].add(z)
        return x


class MultiGridCL:
    """V-cycle preconditioner over a space hierarchy (cutmg.py:17-57)."""

    def __init__(self, mats, prols, smoothers, coarse_freedofs=None,
                 nsmooth=2):
        self.mats = mats  # [coarse..fine]
        self.prols = prols  # prols[l]: level l -> level l+1
        self.smoothers = smoothers  # per level (None on the coarsest)
        self.nsmooth = nsmooth
        # coarse solve: device Cholesky of the coarse FREE block only.
        # Memory is O(nc^2) with nc = #free dofs on the COARSEST grid — which
        # is small by construction; the factorization happens once, the
        # per-cycle work is two triangular solves, fully on device and
        # jit-safe (host callbacks are unsupported on the TPU backend).
        n0 = mats[0].shape[0]
        free = (np.ones(n0, bool) if coarse_freedofs is None
                else np.asarray(coarse_freedofs.np
                                if hasattr(coarse_freedofs, "np")
                                else coarse_freedofs))
        idx = np.nonzero(free)[0]
        A0 = mats[0].to_scipy().tocsr()[idx][:, idx].toarray()
        # symmetrize (COO duplicates / roundoff) and factor ON HOST (A0 is
        # host numpy already; device cholesky would silently produce NaNs for
        # an indefinite Nitsche/saddle-point coarse block).  SPD -> Cholesky;
        # otherwise fall back to an LU factorization.
        A0 = 0.5 * (A0 + A0.T)
        try:
            L = np.linalg.cholesky(A0)
            self._coarse_fac = ("chol",
                                jnp.asarray(L, dtype=config.dtype))
        except np.linalg.LinAlgError:
            import scipy.linalg as sla

            lu, piv = sla.lu_factor(A0)
            self._coarse_fac = ("lu", jnp.asarray(lu, dtype=config.dtype),
                                jnp.asarray(piv))
        self._coarse_idx = jnp.asarray(idx)
        self._coarse_n = n0

    def _coarse_solve(self, b):
        if self._coarse_fac[0] == "chol":
            from jax.scipy.linalg import cho_solve

            z = cho_solve((self._coarse_fac[1], True), b[self._coarse_idx])
        else:
            from jax.scipy.linalg import lu_solve

            z = lu_solve((self._coarse_fac[1], self._coarse_fac[2]),
                         b[self._coarse_idx])
        out = jnp.zeros((self._coarse_n,), dtype=config.dtype)
        return out.at[self._coarse_idx].set(z)

    def _cycle(self, l, b):
        if l == 0:
            return self._coarse_solve(b)
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
