"""Flagship model: unfitted (fictitious-domain) Poisson, fully batched.

This is the benchmark configuration of BASELINE.json (the reference's
``py_tutorials/fictdom_ghostpen.py`` workload): level-set geometry, cut-cell
stiffness on the NEG domain, Nitsche boundary terms on the implicit boundary,
facet-patch ghost penalty — expressed as pure element/facet-batched kernels
(no Python object graph in the hot path) so the whole assembly + CG solve is
one XLA program, shardable over the element axis with psum dof reductions
(SURVEY.md §2.8 TPU-native parallelism design).
"""
from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh as DeviceMesh, PartitionSpec as P
from jax import shard_map

from ..ops.straightcut import cut_rule_element
from ..ops.gauss import ET_DIM
from ..mesh.mesh import map_points, det_and_inv
from ..fem.basis import shapes, dshapes, ndof_el
from ..solvers.krylov import cg


def cut_poisson_elmats(et: str, order: int, coords, vals, lam_nitsche=20.0,
                       mixed=False):
    """Element matrices of the fictitious-domain Poisson operator.

    coords (E, nv, d) element vertex coords, vals (E, nv) level-set values.
    Returns (E, nd, nd): NEG-domain stiffness + symmetric Nitsche terms on the
    zero set (the batched analog of SymbolicCutBFI volume+interface assembly,
    reference xfem/symboliccutbfi.cpp:73-276).

    ``mixed=True``: cut-rule geometry (rules, Jacobians, weights) stays in
    the input dtype (f64), the FLOP-heavy B.D.B^T einsums run in f32, and
    the result is cast back — TPU v5e has no native f64 (software-emulated,
    order-of-magnitude slower), so this is the production-precision mode;
    the achieved element-matrix error is measured by bench.py.
    """
    d = ET_DIM[et]
    rule = cut_rule_element(et, vals, 2 * order)
    lo = (lambda a: a.astype(jnp.float32)) if mixed else (lambda a: a)
    hi = (lambda a: a.astype(coords.dtype)) if mixed else (lambda a: a)

    # NEG volume: grad u . grad v
    _, J = map_points(et, coords, rule.pts)
    detJ, Jinv = det_and_inv(J)
    G = dshapes(et, order, rule.pts)  # (E,Q,nd,d)
    Gp = jnp.einsum("eqid,eqdg->eqig", G, Jinv)
    Wn = rule.w * (rule.side == 0) * jnp.abs(detJ)
    A = hi(jnp.einsum("eq,eqig,eqjg->eij", lo(Wn), lo(Gp), lo(Gp)))

    # interface Nitsche: -dn(u) v - dn(v) u + lam/h u v   (outward normal of NEG)
    _, Ji = map_points(et, coords, rule.pts_if)
    detJi, Jiinv = det_and_inv(Ji)
    nphys = jnp.einsum("eqdg,eqd->eqg", Jiinv, rule.nref)
    nn = jnp.linalg.norm(nphys, axis=-1, keepdims=True)
    nphys = nphys / jnp.where(nn < 1e-30, 1.0, nn)
    Wi = rule.w_if * jnp.abs(detJi) * nn[..., 0]
    B = shapes(et, order, rule.pts_if)  # (E,Qi,nd)
    Gi = dshapes(et, order, rule.pts_if)
    Gip = jnp.einsum("eqid,eqdg->eqig", Gi, Jiinv)
    dn = jnp.einsum("eqig,eqg->eqi", Gip, nphys)
    # mesh size from element volume
    h = jnp.abs(detJ[:, :1]) ** (1.0 / d)  # (E,1)
    lam = lam_nitsche * order * order / jnp.maximum(h[:, 0], 1e-30)  # (E,)
    # symmetric-by-construction: the Nitsche cross term is computed ONCE and
    # transposed, and the whole matrix is symmetrized — on TPU the default
    # (bf16-pass) einsum precision otherwise breaks A = A^T at ~3e-3, which
    # stalls CG/MG (docs/PERFORMANCE.md "f32 numerical integrity")
    C = hi(jnp.einsum("eq,eqi,eqj->eij", lo(Wi), lo(dn), lo(B)))
    A = A - C - jnp.swapaxes(C, 1, 2)
    A = A + hi(jnp.einsum("e,eq,eqi,eqj->eij", lo(lam), lo(Wi), lo(B), lo(B)))
    return 0.5 * (A + jnp.swapaxes(A, 1, 2))


def cut_poisson_rhs_elvecs(et: str, order: int, coords, vals, f_fn):
    """Element load vectors  int_NEG f v  with f_fn(phys_pts)->values."""
    rule = cut_rule_element(et, vals, 2 * order + ET_DIM[et])
    phys, J = map_points(et, coords, rule.pts)
    detJ, _ = det_and_inv(J)
    Wn = rule.w * (rule.side == 0) * jnp.abs(detJ)
    B = shapes(et, order, rule.pts)
    fv = f_fn(phys)
    return jnp.einsum("eq,eq,eqi->ei", Wn, fv, B)


def ghost_penalty_elmats(et: str, order: int, coords1, coords2, gamma=0.1,
                         mixed=False):
    """Facet-patch ghost penalty  gamma/h^2 (u-u_other)(v-v_other)  per facet.

    coords1/coords2 (F, nv, d): the two neighbor elements of each marked
    facet.  Returns (F, 2nd, 2nd) on the stacked [self; other] dof axis (the
    batched analog of SymbolicFacetPatchBFI, xfem/symboliccutbfi.cpp:1104-1413;
    neighbor mapping is affine-exact for simplicial meshes).
    """
    from ..ops.gauss import reference_rule

    d = ET_DIM[et]
    rp, rw = reference_rule(et, 2 * order)
    rp = jnp.asarray(rp, dtype=coords1.dtype)
    rw = jnp.asarray(rw, dtype=coords1.dtype)
    F, nq = coords1.shape[0], rp.shape[0]
    base = jnp.broadcast_to(rp[None], (F, nq, d))

    def into_other(coords_from, coords_to, refpts):
        phys, _ = map_points(et, coords_from, refpts)
        c = jnp.full((F, 1, d), 0.25 if et in ("trig", "tet") else 0.5,
                     dtype=coords1.dtype)
        cp, Jc = map_points(et, coords_to, c)
        _, Jcinv = det_and_inv(Jc)
        return jnp.einsum("eqg,eodg->eqd", phys - cp, Jcinv) + c

    p12 = into_other(coords1, coords2, base)
    p21 = into_other(coords2, coords1, base)

    _, J1 = map_points(et, coords1, base)
    _, J2 = map_points(et, coords2, base)
    det1, _ = det_and_inv(J1)
    det2, _ = det_and_inv(J2)
    w = jnp.concatenate([jnp.abs(det1) * rw[None], jnp.abs(det2) * rw[None]], axis=1)

    B1 = jnp.concatenate([shapes(et, order, base), shapes(et, order, p21)], axis=1)
    B2 = jnp.concatenate([shapes(et, order, p12), shapes(et, order, base)], axis=1)
    Bj = jnp.concatenate([B1, -B2], axis=2)  # (F, 2nq, 2nd): u - u_other

    h = jnp.abs(det1[:, :1]) ** (1.0 / d)
    scale = gamma / jnp.maximum(h[:, 0] ** 2, 1e-30)
    lo = (lambda a: a.astype(jnp.float32)) if mixed else (lambda a: a)
    out = jnp.einsum("f,fq,fqi,fqj->fij", lo(scale), lo(w), lo(Bj), lo(Bj))
    out = 0.5 * (out + jnp.swapaxes(out, 1, 2))  # exact symmetry
    return out.astype(coords1.dtype) if mixed else out


@lru_cache(maxsize=None)
def _affine_stiffness_S(et, order):
    """Host: the constant affine-element stiffness tensor
    S[i,d,j,c] = sum_q w_q dN[q,i,d] dN[q,j,c] (exact: degree-2(order-1)
    integrand).  With it, the standard-tier element stiffness factorizes as
    A[e,i,j] = |detJ_e| * sum_{d,c} M_e[d,c] S[i,d,j,c],
    M_e[d,c] = sum_g Jinv[e,d,g] Jinv[e,c,g] — no quadrature axis on device.

    Evaluated in f64 regardless of the global x64 flag (the coefficients are
    baked as python-float literals into both f32 and f64 programs).
    """
    from ..ops.gauss import reference_rule
    from ..fem.basis import lagrange_element

    rp = np.asarray(reference_rule(et, max(2 * order - 2, 0))[0], np.float64)
    rw = np.asarray(reference_rule(et, max(2 * order - 2, 0))[1], np.float64)
    b = lagrange_element(et, order)
    exps, C = b["exps"], b["coeff"]
    Q, d = rp.shape
    nm = exps.shape[0]
    G = np.zeros((Q, C.shape[1], d))
    for ax in range(d):
        dm = np.zeros((Q, nm))
        for m in range(nm):
            e_ax = int(exps[m, ax])
            if e_ax == 0:
                continue
            v = np.full(Q, float(e_ax))
            for j in range(d):
                e = int(exps[m, j]) - (1 if j == ax else 0)
                if e > 0:
                    v = v * rp[:, j] ** e
            dm[:, m] = v
        G[:, :, ax] = dm @ C
    return np.einsum("q,qid,qjc->idjc", rw, G, G)


def _soa_corner_arrays(vertices, elements, lset_vertex):
    """SoA gathers: per-corner coordinate and level-set (E,) vectors.

    TPU tile padding makes (E, nv, d)-shaped gathers ~85x larger in HBM than
    their payload ((nv, d) = (4, 3) trailing dims pad to (8, 128)); gathering
    per corner keeps every array (E,)- or (E, d)-shaped instead.
    """
    nv = elements.shape[1]
    d = vertices.shape[1]
    x, lv = [], []
    for i in range(nv):
        idx = jnp.asarray(elements[:, i])
        rows = vertices[idx]  # (E, d)
        x.append([rows[:, a] for a in range(d)])
        lv.append(lset_vertex[idx])
    return x, lv


def _soa_jacobian(x, d):
    """Unrolled affine-simplex Jacobian from SoA corners: returns
    (det (E,), Jinv nested lists [d][g] of (E,))."""
    J = [[x[b + 1][a] - x[0][a] for b in range(d)] for a in range(d)]
    if d == 3:
        c00 = J[1][1] * J[2][2] - J[1][2] * J[2][1]
        c01 = J[0][2] * J[2][1] - J[0][1] * J[2][2]
        c02 = J[0][1] * J[1][2] - J[0][2] * J[1][1]
        c10 = J[1][2] * J[2][0] - J[1][0] * J[2][2]
        c11 = J[0][0] * J[2][2] - J[0][2] * J[2][0]
        c12 = J[0][2] * J[1][0] - J[0][0] * J[1][2]
        c20 = J[1][0] * J[2][1] - J[1][1] * J[2][0]
        c21 = J[0][1] * J[2][0] - J[0][0] * J[2][1]
        c22 = J[0][0] * J[1][1] - J[0][1] * J[1][0]
        det = J[0][0] * c00 + J[0][1] * c10 + J[0][2] * c20
        inv_det = 1.0 / det
        Jinv = [[c00 * inv_det, c01 * inv_det, c02 * inv_det],
                [c10 * inv_det, c11 * inv_det, c12 * inv_det],
                [c20 * inv_det, c21 * inv_det, c22 * inv_det]]
    elif d == 2:
        det = J[0][0] * J[1][1] - J[0][1] * J[1][0]
        inv_det = 1.0 / det
        Jinv = [[J[1][1] * inv_det, -J[0][1] * inv_det],
                [-J[1][0] * inv_det, J[0][0] * inv_det]]
    else:
        det = J[0][0]
        Jinv = [[1.0 / det]]
    return det, Jinv


def _std_stiffness_soa_flat(et, order, S_np, det, Jinv, w):
    """SoA standard-tier stiffness: flat (nd*nd*E,) values in (i, j, e)
    order.  All device arrays are (E,) vectors — tile-padding-free; the
    structure indices (i, j, d, c) are unrolled into the program."""
    d = {"trig": 2, "tet": 3, "segm": 1}[et]
    nd_l = S_np.shape[0]
    M = [[sum(Jinv[a][g] * Jinv[b][g] for g in range(d)) for b in range(d)]
         for a in range(d)]
    W = jnp.abs(det) * w
    A = [[None] * nd_l for _ in range(nd_l)]
    for i in range(nd_l):
        for j in range(i, nd_l):
            s = None
            for a in range(d):
                for b in range(d):
                    coef = float(S_np[i, a, j, b])
                    if abs(coef) > 1e-14:
                        t = coef * M[a][b]
                        s = t if s is None else s + t
            Aij = W * s if s is not None else jnp.zeros_like(W)
            A[i][j] = Aij
            A[j][i] = Aij
    return jnp.concatenate([A[i][j] for i in range(nd_l)
                            for j in range(nd_l)])


def ghost_penalty_flat_soa(et, x1, x2, gamma=0.1):
    """SoA closed-form P1 facet-patch ghost penalty.

    For P1 the patch jump (u - u_other) is affine on each of the two patch
    elements, so the penalty integral is exact from vertex values alone:
    int_T f g = V_T / ((d+1)(d+2)) * [sum_k f_k g_k + (sum_k f_k)(sum_k g_k)]
    for affine f, g on a d-simplex.  All arrays stay (F,)-shaped (the AoS
    kernel materializes (F, 2Q, 2nd) quadrature tensors).  Mirrors
    `ghost_penalty_elmats` (reference SymbolicFacetPatchBFI,
    xfem/symboliccutbfi.cpp:1104-1413).

    x1/x2: nested per-corner coordinate lists [nv][d] of (F,) vectors for
    the two neighbor elements.  Returns nested A[i][j] ((2nv)^2) of (F,).
    """
    d = ET_DIM[et]
    nv = d + 1
    b0, Gref, _ = _p1_affine_basis(et)
    det1, Jinv1 = _soa_jacobian(x1, d)
    det2, Jinv2 = _soa_jacobian(x2, d)
    V1 = jnp.abs(det1) / float(np.prod(range(1, d + 1)))
    V2 = jnp.abs(det2) / float(np.prod(range(1, d + 1)))

    def basis_at(Jinv, x0, pt):
        """All P1 basis values of the element (Jinv, x0) at physical pt."""
        xi = [sum(Jinv[a][g] * (pt[g] - x0[g]) for g in range(d))
              for a in range(d)]
        return [float(b0[i]) + sum(float(Gref[i, a]) * xi[a]
                                   for a in range(d)) for i in range(nv)]

    from ..integrate import vertex_local_ids

    vperm = vertex_local_ids(et, 1)  # corner k holds Lagrange node vperm[k]
    x0_1 = [x1[0][g] for g in range(d)]
    x0_2 = [x2[0][g] for g in range(d)]
    # f_i values at the patch vertices; vertex columns: [T1 verts; T2 verts]
    # f_i = B1_i (i < nv), f_i = -B2_{i-nv} (i >= nv)   [the (u - u_other)
    # jump with the same stacked-dof sign convention as ghost_penalty_elmats]
    F = [[None] * (2 * nv) for _ in range(2 * nv)]
    for k in range(nv):
        pt1 = [x1[k][g] for g in range(d)]
        pt2 = [x2[k][g] for g in range(d)]
        B2_at_1 = basis_at(Jinv2, x0_2, pt1)
        B1_at_2 = basis_at(Jinv1, x0_1, pt2)
        for i in range(nv):
            F[i][k] = 1.0 if i == int(vperm[k]) else 0.0
            F[i][nv + k] = B1_at_2[i]
            F[nv + i][k] = -B2_at_1[i]
            F[nv + i][nv + k] = -1.0 if i == int(vperm[k]) else 0.0

    c = 1.0 / ((d + 1) * (d + 2))
    h2 = jnp.abs(det1) ** (2.0 / d)
    scale = gamma / jnp.maximum(h2, 1e-30)
    w1 = scale * V1 * c
    w2 = scale * V2 * c
    A = [[None] * (2 * nv) for _ in range(2 * nv)]
    for i in range(2 * nv):
        for j in range(i, 2 * nv):
            s1 = None
            s2 = None
            sum_i1 = sum_j1 = sum_i2 = sum_j2 = None
            for k in range(nv):
                t = F[i][k] * F[j][k]
                s1 = t if s1 is None else s1 + t
                t = F[i][nv + k] * F[j][nv + k]
                s2 = t if s2 is None else s2 + t
                sum_i1 = F[i][k] if sum_i1 is None else sum_i1 + F[i][k]
                sum_j1 = F[j][k] if sum_j1 is None else sum_j1 + F[j][k]
                sum_i2 = (F[i][nv + k] if sum_i2 is None
                          else sum_i2 + F[i][nv + k])
                sum_j2 = (F[j][nv + k] if sum_j2 is None
                          else sum_j2 + F[j][nv + k])
            Aij = (w1 * (s1 + sum_i1 * sum_j1)
                   + w2 * (s2 + sum_i2 * sum_j2))
            A[i][j] = Aij
            A[j][i] = Aij
    return A


@lru_cache(maxsize=None)
def _p1_affine_basis(et):
    """Host: P1 basis as an affine map: B_i(p) = b0[i] + Gref[i, :] @ p,
    plus the reference vertex coordinates R (basis-node order)."""
    from ..fem.basis import lagrange_element

    b = lagrange_element(et, 1)
    exps, C = b["exps"], b["coeff"]
    d = exps.shape[1]
    nv = C.shape[1]
    b0 = np.zeros(nv)
    Gref = np.zeros((nv, d))
    for m in range(exps.shape[0]):
        e = exps[m]
        if e.sum() == 0:
            b0 += C[m]
        elif e.sum() == 1:
            Gref[:, int(np.argmax(e))] += C[m]
    return b0, Gref, b["nodes"]


def cut_poisson_flat_soa(et, lv, det, Jinv, lam_nitsche):
    """One-pass SoA P1 fictitious-domain Poisson element values.

    For P1 on affine simplices every term of the cut operator reduces to
    closed-form scalars per element: basis gradients are element-constant, so
    the NEG-volume stiffness needs only the NEG reference volume; the
    interface is planar, so the Nitsche terms need only degree<=2 interface
    moments (midpoint rule on <=2 reference sub-triangles / 2-pt Gauss on the
    segment).  Everything is computed from the edge cut parameters
    t = phi_a / (phi_a - phi_b) in REFERENCE coordinates — no quadrature
    tensors, no physical cut points, no (E, Q, nd, d) arrays to tile-pad.

    The 2^(d+1) sign patterns are unrolled at trace time as masked vector
    arithmetic over the validated decomposition tables
    (ops/cuttables._decompose — the batched analog of the reference's
    LevelsetCutSimplex::Decompose, cutint/straightcutrule.cpp:131-204; the
    cut stiffness/Nitsche forms mirror xfem/symboliccutbfi.cpp:73-276).
    The uncut-NEG pattern contributes the full reference volume, so this
    single pass covers BOTH tiers of the former std/cut split.

    Args: lv list[nv] of eps-guarded (E,) level-set values, det (E,),
    Jinv nested list [d][d] of (E,) (J^{-1}[d, g]).  Returns A as a nested
    list A[i][j] of (E,) vectors (symmetric).
    """
    import math

    from ..ops.cuttables import _decompose
    from ..integrate import vertex_local_ids

    d = ET_DIM[et]
    nv = d + 1
    b0, Gref, R = _p1_affine_basis(et)
    # `lv` arrives in element-corner (REF_VERTS) order; everything below —
    # basis values, gradients, the output dof indices — lives in Lagrange
    # node order, so permute once (corner c sits at node vperm[c])
    vperm = vertex_local_ids(et, 1)
    inv = np.argsort(vperm)
    lv = [lv[int(inv[j])] for j in range(nv)]
    dtype = det.dtype
    zero = jnp.zeros_like(det)

    absdet = jnp.abs(det)
    # element-constant physical basis gradients Gp[i][g]
    Gp = [[sum(float(Gref[i, a]) * Jinv[a][g] for a in range(d))
           for g in range(d)] for i in range(nv)]
    K = [[sum(Gp[i][g] * Gp[j][g] for g in range(d)) for j in range(nv)]
         for i in range(nv)]
    # reference / physical level-set gradients (element-constant)
    gref = [sum(float(Gref[i, a]) * lv[i] for i in range(nv)) for a in range(d)]
    gphys = [sum(Jinv[a][g] * gref[a] for a in range(d)) for g in range(d)]
    ngref = jnp.sqrt(sum(g * g for g in gref))
    ngphys = jnp.sqrt(sum(g * g for g in gphys))
    nsafe = jnp.maximum(ngphys, 1e-30)
    nphys = [g / nsafe for g in gphys]          # outward normal of NEG
    dn = [sum(Gp[i][g] * nphys[g] for g in range(d)) for i in range(nv)]
    # physical measure of a unit-ref-area piece of the interface plane
    ifscale = absdet * ngphys / jnp.maximum(ngref, 1e-30)
    h = absdet ** (1.0 / d)
    lam = lam_nitsche / jnp.maximum(h, 1e-30)

    # edge cut parameters (safe everywhere; only used under matching masks)
    def tpar(a, b):
        den = lv[a] - lv[b]
        den = jnp.where(jnp.abs(den) < 1e-30, 1.0, den)
        return lv[a] / den

    pos = [(v > 0) for v in lv]
    pat = None
    for i in range(nv):
        term = pos[i].astype(jnp.int32) << i
        pat = term if pat is None else pat | term

    Wvol = zero          # NEG volume in reference coordinates
    m_if = []            # (weight (E,), point coords list[d]) if-quad points

    for p in range(2 ** nv):
        negs = [i for i in range(nv) if not (p >> i) & 1]
        poss = [i for i in range(nv) if (p >> i) & 1]
        if not negs:
            continue
        mask = (pat == p).astype(dtype)
        if not poss:
            Wvol = Wvol + mask * (1.0 / math.factorial(d))
            continue
        subs, sides, ifs = _decompose(d, p)
        ts = {}

        def pt(spec):
            a, b = spec
            if a == b:
                return [float(R[a][g]) for g in range(d)]
            if (a, b) not in ts:
                ts[(a, b)] = tpar(a, b)
            t = ts[(a, b)]
            return [float(R[a][g]) + t * (float(R[b][g]) - float(R[a][g]))
                    for g in range(d)]

        for sub, side in zip(subs, sides):
            if side != 0:
                continue
            ps = [pt(s) for s in sub]
            e = [[ps[k + 1][g] - ps[0][g] for g in range(d)]
                 for k in range(d)]
            if d == 3:
                vol = (e[0][0] * (e[1][1] * e[2][2] - e[1][2] * e[2][1])
                       - e[0][1] * (e[1][0] * e[2][2] - e[1][2] * e[2][0])
                       + e[0][2] * (e[1][0] * e[2][1] - e[1][1] * e[2][0]))
                vol = jnp.abs(vol) / 6.0
            elif d == 2:
                vol = jnp.abs(e[0][0] * e[1][1] - e[0][1] * e[1][0]) / 2.0
            else:
                vol = jnp.abs(e[0][0])
            Wvol = Wvol + mask * vol

        for f in ifs:
            ps = [pt(s) for s in f]
            if d == 3:
                u = [ps[1][g] - ps[0][g] for g in range(3)]
                v = [ps[2][g] - ps[0][g] for g in range(3)]
                cx = u[1] * v[2] - u[2] * v[1]
                cy = u[2] * v[0] - u[0] * v[2]
                cz = u[0] * v[1] - u[1] * v[0]
                area = 0.5 * jnp.sqrt(cx * cx + cy * cy + cz * cz)
                w = mask * area / 3.0
                # edge-midpoint rule: exact for degree 2
                for (a, b) in ((0, 1), (1, 2), (0, 2)):
                    q = [0.5 * (ps[a][g] + ps[b][g]) for g in range(3)]
                    m_if.append((w, q))
            elif d == 2:
                u = [ps[1][g] - ps[0][g] for g in range(2)]
                ln = jnp.sqrt(u[0] * u[0] + u[1] * u[1])
                w = mask * ln / 2.0
                # 2-pt Gauss: exact for degree 3
                c = 0.5 / np.sqrt(3.0)
                for s in (-c, c):
                    q = [0.5 * (ps[0][g] + ps[1][g]) + s * u[g]
                         for g in range(2)]
                    m_if.append((w, q))
            else:
                m_if.append((mask, [ps[0][0]]))

    Wp = Wvol * absdet
    A = [[Wp * K[i][j] if j >= i else None for j in range(nv)]
         for i in range(nv)]

    # Nitsche: -dn_i B_j - dn_j B_i + lam B_i B_j over the interface points
    for (w, q) in m_if:
        wp = w * ifscale
        B = [float(b0[i]) + sum(float(Gref[i, g]) * q[g] for g in range(d))
             for i in range(nv)]
        wl = wp * lam
        for i in range(nv):
            for j in range(i, nv):
                A[i][j] = (A[i][j]
                           - wp * (dn[i] * B[j] + dn[j] * B[i])
                           + wl * B[i] * B[j])
    for i in range(nv):
        for j in range(i):
            A[i][j] = A[j][i]
    return A


def _map_blocks(fn, blk, *args):
    """Apply `fn` over leading-axis blocks of size `blk` via lax.map so the
    per-element temporaries stay bounded.  XLA pads the small trailing dims
    of FEM tensors (nd=4, d=3 -> (8,128) tiles, ~40x expansion); running all
    elements at once therefore OOMs HBM beyond ~1M elements, while a scanned
    block reuses one temp buffer.  Results are concatenated and truncated
    back to the true length."""
    n = args[0].shape[0]
    nb = -(-n // blk)
    pad = nb * blk - n
    padded = [jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)) for a in args]
    stacked = [a.reshape((nb, blk) + a.shape[1:]) for a in padded]
    out = jax.lax.map(lambda xs: fn(*xs), tuple(stacked))
    return out.reshape((nb * blk,) + out.shape[2:])[:n]


class UnfittedPoisson:
    """Fictitious-domain Poisson on a structured simplicial mesh.

    Host-side topology once; all compute in pure jittable functions over
    (vertices, level-set dofs, dof vectors).

    Moving level sets: every kernel derives tier weights, identity rows and
    dof masking from the RUNTIME ``lset_vertex`` (``active_dof_mask``).  The
    lattice path (``assemble_vals_lattice`` with a DIA structure) also
    re-marks the ghost-penalty band on device, so it is fully
    level-set-dynamic.  The other assembly paths and ``apply*`` keep
    the ghost-penalty band frozen at construction — if the runtime band
    differs they poison the result with NaN (``_band_guard``) instead of
    being silently wrong; rebuild the model (or use the lattice path) for a
    band that actually moves.
    """

    def __init__(self, nx=16, dim=3, order=1, dtype=jnp.float32,
                 lam_nitsche=20.0, gamma_gp=0.1, radius=0.4):
        from ..mesh.structured import MakeStructured2DMesh, MakeStructured3DMesh
        from ..fem.space import H1
        from ..fem.gridfunction import GridFunction

        self.dim, self.order, self.dtype = dim, order, dtype
        self.nx = nx
        self.lam_nitsche, self.gamma_gp = lam_nitsche, gamma_gp
        if dim == 2:
            self.mesh = MakeStructured2DMesh(quads=False, nx=nx, ny=nx)
        else:
            self.mesh = MakeStructured3DMesh(hexes=False, nx=nx, ny=nx, nz=nx)
        self.et = self.mesh.et
        self.space = H1(self.mesh, order=order)
        self.ndof = self.space.ndof
        self.nd = ndof_el(self.et, order)

        # level set: sphere of given radius around the box center
        c = 0.5
        v = self.mesh.vertices_np
        self.lset_np = np.sqrt(((v - c) ** 2).sum(1)) - radius
        self.lset = jnp.asarray(self.lset_np, dtype=dtype)

        from ..integrate import vertex_local_ids

        vperm = vertex_local_ids(self.et, 1)
        # element-local vertex ordering of the scalar P1 dofs
        from ..fem.space import H1 as _H1

        p1 = self.space if order == 1 else _H1(self.mesh, order=1)
        self.el2vert = p1.el2dof_np[:, vperm]  # (ne, nvel) into vertex-P1 dofs
        self.p1space = p1
        # map P1 dof -> vertex coordinate index: P1 dofs correspond to mesh
        # vertices but in fingerprint order; build permutation
        self.p1dof2vertex = self._p1_vertex_permutation(p1)
        self.vertices = jnp.asarray(self.mesh.vertices_np, dtype=dtype)
        # Static index tables stay HOST numpy: inside jit they bake into the
        # executable as literals with no device round trip.  Closure-capturing
        # *device* arrays instead forces a device->host read at lowering time,
        # which on tunneled single-chip setups (axon) permanently degrades
        # dispatch to a synchronous ~ms-latency mode — see bench.py.
        self.el2dof = np.asarray(self.space.el2dof_np)
        self.elements = self.mesh.elements_np

        # ghost-penalty facets: between elements touching the interface band
        vals_el = self.lset_np[self.mesh.elements_np]
        has_neg = (vals_el < 0).any(1)
        has_pos = (vals_el > 0).any(1)
        cut = has_neg & has_pos
        f2e = self.mesh.facet2el_np
        interior = f2e[:, 1] >= 0
        e1 = np.maximum(f2e[:, 0], 0)
        e2 = np.maximum(f2e[:, 1], 0)
        gp = interior & ((cut[e1] & (has_neg[e2])) | (cut[e2] & has_neg[e1]))
        self.gp_facets = np.nonzero(gp)[0]
        self.gp_e1 = f2e[self.gp_facets, 0]
        self.gp_e2 = f2e[self.gp_facets, 1]

        self.active = has_neg  # active element mask (INIT level set)
        ad = np.zeros(self.ndof, dtype=bool)
        ad[self.space.el2dof_np[has_neg].ravel()] = True
        self.active_dofs = ad  # host numpy (see note above); INIT level set —
        # kernels taking a runtime lset_vertex use active_dof_mask() instead
        self._gp_sel_np = gp  # frozen ghost-penalty band (all-facet mask)

    def _p1_vertex_permutation(self, p1):
        # P1 dof i sits at vertex dof_rep: match by element/local vertex
        from ..integrate import vertex_local_ids

        perm = np.zeros(p1.ndof, dtype=np.int64)
        vperm = vertex_local_ids(self.et, 1)
        e2d = p1.el2dof_np[:, vperm]  # (ne, nvel) P1 dof of local vertex
        els = self.mesh.elements_np
        perm[e2d.ravel()] = els.ravel()
        return perm

    # -- pure kernels --------------------------------------------------------
    def lset_elem_vals(self, lset_vertex):
        """(ne, nvel) from per-vertex level-set values."""
        return lset_vertex[self.elements][..., :]

    def active_dof_mask(self, lset_vertex):
        """Runtime active-dof mask from the CURRENT level set (has_neg
        dilated through el2dof).  Kernels use this instead of the
        init-frozen ``self.active_dofs`` so a moved level set gets the
        correct identity rows / dof masking (same raw sign convention as
        ``__init__``)."""
        vals = lset_vertex[self.elements]
        has_neg = jnp.any(vals < 0, axis=1)
        e2d = self.el2dof
        act = jnp.zeros((self.ndof,), dtype=bool)
        return act.at[e2d.reshape(-1)].max(
            jnp.broadcast_to(has_neg[:, None], e2d.shape).reshape(-1))

    def _band_guard(self, lset_vertex, dtype):
        """1.0 while the runtime ghost-penalty band equals the band frozen
        into the structure's gp slots; NaN once the level set moves out of
        it — loud, never silently wrong (the lattice path instead re-marks
        the band on device and needs no guard)."""
        vals = lset_vertex[self.elements]
        has_neg = jnp.any(vals < 0, axis=1)
        has_pos = jnp.any(vals > 0, axis=1)
        cut = has_neg & has_pos
        f2e = self.mesh.facet2el_np
        interior = f2e[:, 1] >= 0
        e1 = np.maximum(f2e[:, 0], 0)
        e2 = np.maximum(f2e[:, 1], 0)
        gpr = interior & ((cut[e1] & has_neg[e2]) | (cut[e2] & has_neg[e1]))
        ok = jnp.all(gpr == self._gp_sel_np)
        return jnp.where(ok, jnp.asarray(1.0, dtype),
                         jnp.asarray(jnp.nan, dtype))

    def elmats(self, vertices, lset_vertex):
        coords = vertices[self.elements]
        vals = lset_vertex[self.elements]
        A = cut_poisson_elmats(self.et, self.order, coords, vals, self.lam_nitsche)
        return A

    def elmats_compact(self, vertices, lset_vertex, elements,
                       cut_capacity, block=None, mixed=False):
        """Two-tier assembly: cheap standard rule on uncut-NEG elements, full
        cut kernel only on a fixed-capacity compaction of cut elements.

        Returns (A_std (ne,nd,nd), A_cut (cap,nd,nd), cut_ids (cap,), ncut).
        The capacity is static; `ncut` lets the caller detect overflow.
        With `block` set, both tiers stream through lax.map blocks of that
        many elements (`_map_blocks`) to bound HBM temporaries — required
        beyond ~1M elements.
        """
        from ..ops.straightcut import eps_guard, eps_guard_list
        from ..ops.gauss import reference_rule

        et, order = self.et, self.order
        vals = eps_guard(lset_vertex[elements])
        has_neg = jnp.any(vals < 0, axis=1)
        has_pos = jnp.any(vals > 0, axis=1)
        cut = has_neg & has_pos
        neg_uncut = has_neg & ~has_pos
        ncut = jnp.sum(cut)
        cut_ids = jnp.nonzero(cut, size=cut_capacity, fill_value=0)[0]
        # slot i is valid iff i < ncut (fill slots duplicate element 0)
        cmask = (jnp.arange(cut_capacity) < ncut).astype(vertices.dtype)

        # tier 1: standard stiffness on all elements, weight-masked to
        # uncut-NEG (exact: polynomial integrand)
        rp, rw = reference_rule(et, max(2 * order - 2, 0))
        rp = jnp.asarray(rp, dtype=vertices.dtype)
        rw = jnp.asarray(rw, dtype=vertices.dtype)
        coords = vertices[elements]

        lo = (lambda a: a.astype(jnp.float32)) if mixed else (lambda a: a)

        def std_tier(coords_b, w_b):
            E = coords_b.shape[0]
            pts = jnp.broadcast_to(rp[None], (E,) + rp.shape)
            _, J = map_points(et, coords_b, pts)
            detJ, Jinv = det_and_inv(J)
            G = dshapes(et, order, pts)
            Gp = jnp.einsum("eqid,eqdg->eqig", G, Jinv)
            W = rw[None, :] * jnp.abs(detJ) * w_b[:, None]
            out = jnp.einsum("eq,eqig,eqjg->eij", lo(W), lo(Gp), lo(Gp))
            out = 0.5 * (out + jnp.swapaxes(out, 1, 2))  # exact symmetry
            return out.astype(vertices.dtype) if mixed else out

        w_std = neg_uncut.astype(vertices.dtype)
        if block is None:
            A_std = std_tier(coords, w_std)
        else:
            A_std = _map_blocks(std_tier, block, coords, w_std)

        # tier 2: full cut kernel on the compacted cut elements
        ccoords = coords[cut_ids]
        cvals = vals[cut_ids]

        def cut_tier(c_b, v_b):
            return cut_poisson_elmats(et, order, c_b, v_b, self.lam_nitsche,
                                      mixed=mixed)

        if block is None:
            A_cut = cut_tier(ccoords, cvals)
        else:
            A_cut = _map_blocks(cut_tier, block, ccoords, cvals)
        A_cut = A_cut * cmask[:, None, None]
        return A_std, A_cut, cut_ids, ncut

    def apply_compact(self, vertices, lset_vertex, x, cut_capacity):
        elements, el2dof = self.elements, self.el2dof
        A_std, A_cut, cut_ids, ncut = self.elmats_compact(
            vertices, lset_vertex, elements, cut_capacity
        )
        ye = jnp.einsum("eij,ej->ei", A_std, x[el2dof])
        y = jnp.zeros_like(x).at[el2dof.reshape(-1)].add(ye.reshape(-1))
        cd = el2dof[cut_ids]
        yc = jnp.einsum("eij,ej->ei", A_cut, x[cd])
        y = y.at[cd.reshape(-1)].add(yc.reshape(-1))
        G = self.gp_mats(vertices)
        dmap = np.concatenate([el2dof[self.gp_e1], el2dof[self.gp_e2]], axis=1)
        yf = jnp.einsum("fij,fj->fi", G, x[dmap])
        y = y.at[dmap.reshape(-1)].add(yf.reshape(-1))
        # overflow + stale-band detection: never silently wrong
        poison = jnp.where(ncut <= cd.shape[0], 1.0, jnp.nan).astype(x.dtype)
        poison = poison * self._band_guard(lset_vertex, x.dtype)
        act = self.active_dof_mask(lset_vertex)
        return jnp.where(act, y, x) * poison

    def ell_structure(self):
        """Host precompute of the static global-operator structure: ELL column
        table (ndof, K) plus flat value-slot maps for element matrices
        (ne*nd*nd) and ghost-penalty facet matrices (F*(2nd)^2).

        The sparsity pattern depends only on topology, so the per-step device
        work is ONE scatter-add of the element/facet matrices into the ELL
        value table — the "global operator build" stage of the pipeline.
        """
        import numpy as np

        e2d = self.space.el2dof_np
        ne, nd = e2d.shape
        rows_e = np.broadcast_to(e2d[:, :, None], (ne, nd, nd)).reshape(-1)
        cols_e = np.broadcast_to(e2d[:, None, :], (ne, nd, nd)).reshape(-1)
        fdof = np.concatenate([e2d[self.gp_e1], e2d[self.gp_e2]], axis=1)
        F, nd2 = fdof.shape
        rows_f = np.broadcast_to(fdof[:, :, None], (F, nd2, nd2)).reshape(-1)
        cols_f = np.broadcast_to(fdof[:, None, :], (F, nd2, nd2)).reshape(-1)
        rows = np.concatenate([rows_e, rows_f]).astype(np.int64)
        cols = np.concatenate([cols_e, cols_f]).astype(np.int64)
        # diagonal slot of EVERY dof: the identity contribution for inactive
        # dofs is scattered with a RUNTIME weight (1 - active_dof_mask), so
        # a moving level set re-marks identity rows without rebuilding
        diag = np.arange(self.ndof, dtype=np.int64)
        rows = np.concatenate([rows, diag])
        cols = np.concatenate([cols, diag])

        n = self.ndof
        lin = rows * n + cols
        ne_nd2 = ne * nd * nd
        # native open-addressing dedup (native/topology.cpp dedup_i64): no
        # O(nnz log nnz) sort of the full triplet stream, only the much
        # smaller unique set is ordered per row afterwards
        from ..mesh.native import unique_i64

        uniq, inv = unique_i64(lin)
        nu = len(uniq)
        urows = (uniq // n).astype(np.int64)
        ucols = (uniq % n).astype(np.int32)
        counts = np.bincount(urows, minlength=n)
        K = int(counts.max())
        row_start = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=row_start[1:])
        order = np.argsort(urows, kind="stable")
        pos = np.empty(nu, dtype=np.int64)
        pos[order] = np.arange(nu) - row_start[urows[order]]
        ell_cols = np.zeros((n, K), dtype=np.int32)
        ell_cols[urows, pos] = ucols
        slot_of_uniq = urows * K + pos  # flat slot in the (n, K) value table
        slots = slot_of_uniq[inv]
        ns = len(rows_e)
        # SoA slot order (i, j, e): the tile-padding-free std tier emits its
        # flat value stream with the element index innermost
        slots_soa = (slots[:ns].reshape(ne, nd, nd)
                     .transpose(1, 2, 0).reshape(-1))
        # host numpy throughout: used as baked-in literals inside jit
        return {
            "ell_cols": ell_cols,
            "elm_slots": slots[:ns].astype(np.int32)
            if n * K < 2**31 else slots[:ns],
            "elm_slots_soa": slots_soa.astype(np.int32)
            if n * K < 2**31 else slots_soa,
            "gp_slots": slots[ns:ns + len(rows_f)].astype(np.int32)
            if n * K < 2**31 else slots[ns:ns + len(rows_f)],
            # diag_slots[i] = flat slot of (i, i), aligned with dof index
            "diag_slots": slots[ns + len(rows_f):].astype(np.int32)
            if n * K < 2**31 else slots[ns + len(rows_f):],
            "K": K,
        }

    def dia_structure(self):
        """Host precompute of the offset-diagonal (DIA) global operator in
        vertex-lexicographic numbering.

        On the structured mesh the P1 dof graph is a fixed stencil: in
        lexicographic vertex order every (row, col) coupling has col - row in
        a small constant set (27 offsets in 3D including the ghost-penalty
        second neighbors).  Storing the operator as one (n_off, n) diagonal
        table turns the matvec into n_off static shifted elementwise FMAs —
        ZERO gathers, which on TPU is ~50x faster than the ELL row gather
        (measured 24.5 ms -> sub-ms per SpMV at n=117k; the TPU gather of
        scalars along the minor axis serializes).

        Only valid for order-1 spaces on meshes with a vertex-lexicographic
        permutation (self.p1dof2vertex).  Returns the same slot-table keys as
        `ell_structure` (flat slot = off_idx * n + permuted row) plus
        `offsets` and `perm`; feed to `assemble_ell_vals_soa`, solve in the
        permuted numbering, and un-permute the solution with perm.
        """
        if self.order != 1:
            raise NotImplementedError("DIA structure requires order=1 "
                                      "(vertex-lexicographic numbering)")
        p = np.asarray(self.p1dof2vertex, dtype=np.int64)  # dof -> vertex row
        n = self.ndof
        e2d = p[self.space.el2dof_np]
        ne, nd = e2d.shape
        rows_e = np.broadcast_to(e2d[:, :, None], (ne, nd, nd))
        cols_e = np.broadcast_to(e2d[:, None, :], (ne, nd, nd))
        fdof = np.concatenate([e2d[self.gp_e1], e2d[self.gp_e2]], axis=1)
        F, nd2 = fdof.shape
        rows_f = np.broadcast_to(fdof[:, :, None], (F, nd2, nd2)).reshape(-1)
        cols_f = np.broadcast_to(fdof[:, None, :], (F, nd2, nd2)).reshape(-1)
        pinv = np.empty(n, dtype=np.int64)
        pinv[p] = np.arange(n)

        off_e = (cols_e - rows_e).reshape(-1)
        off_f = cols_f - rows_f
        # offset DISCOVERY uses ALL interior facets (not just the currently
        # selected ghost-penalty band) so the offset set is topology-only —
        # a moving level set can re-mark the band without changing the
        # operator structure (the lattice-GP path computes the band mask on
        # device from the current lset)
        f2e = self.mesh.facet2el_np
        ia = f2e[:, 1] >= 0
        fdof_all = np.concatenate([e2d[f2e[ia, 0]], e2d[f2e[ia, 1]]], axis=1)
        ra = np.broadcast_to(fdof_all[:, :, None],
                             fdof_all.shape + (nd2,)).reshape(-1)
        ca = np.broadcast_to(fdof_all[:, None, :],
                             (fdof_all.shape[0], nd2, nd2)).reshape(-1)
        offsets = np.unique(np.concatenate([off_e, off_f, ca - ra, [0]]))
        oidx_e = np.searchsorted(offsets, off_e)
        oidx_f = np.searchsorted(offsets, off_f)
        slots_e = oidx_e * n + rows_e.reshape(-1)
        slots_f = oidx_f * n + rows_f
        idx0 = int(np.searchsorted(offsets, 0))
        slots_i = idx0 * n + p  # diagonal slot of every dof (dof-indexed)
        soa = (slots_e.reshape(ne, nd, nd).transpose(1, 2, 0).reshape(-1))
        gp_soa = (slots_f.reshape(F, nd2, nd2).transpose(1, 2, 0).reshape(-1))
        it = np.int32 if len(offsets) * n < 2**31 else np.int64
        return {
            "offsets": offsets,
            "perm": p,
            "perm_inv": pinv,
            "elm_slots": slots_e.astype(it),
            "elm_slots_soa": soa.astype(it),
            "gp_slots": slots_f.astype(it),
            "gp_slots_soa": gp_soa.astype(it),
            "diag_slots": slots_i.astype(it),
            "n": n,
        }

    def stencil_groups(self, offsets):
        """Host: scatter-free DIA assembly plan for the structured mesh.

        The structured mesh is lattice-periodic: with cubes enumerated in
        odometer order and S simplices per cube, the permuted dof row of
        corner i of simplex t in cube (a, b, c) is
        a*nv1^2 + b*nv1 + c + D[t, i] with a CONSTANT corner-displacement
        table D (verified by assertion).  Every (t, i, j) element-matrix
        entry therefore lands on a fixed diagonal k at a fixed corner
        displacement — the global element-stream assembly becomes ~50 static
        windowed adds on the (n_off, nv1, ..)-lattice view of the DIA table
        instead of a 10M-value scatter-add (which serializes on TPU).

        Returns (groups, S, nc) where groups maps
        (k, (dz, dy, dx)) -> list of (t, i, j).
        """
        if self.order != 1:
            raise NotImplementedError("stencil assembly requires order=1")
        d = self.dim
        nx = self.nx
        nv1 = nx + 1
        p = np.asarray(self.p1dof2vertex, dtype=np.int64)
        rows = p[self.space.el2dof_np]
        ne, nd = rows.shape
        nc = nx ** d
        S = ne // nc
        assert S * nc == ne
        rows = rows.reshape(nc, S, nd)
        idx = np.arange(nc)
        base = np.zeros(nc, dtype=np.int64)
        rem = idx
        for ax in range(d):
            q = rem // nx ** (d - 1 - ax)
            rem = rem % nx ** (d - 1 - ax)
            base += q * nv1 ** (d - 1 - ax)
        D = rows - base[:, None, None]
        if not (D == D[0:1]).all():
            raise NotImplementedError("mesh is not lattice-periodic")
        D = D[0]  # (S, nd)

        def disp(v):
            out = []
            for ax in range(d):
                out.append(int(v // nv1 ** (d - 1 - ax)))
                v = v % nv1 ** (d - 1 - ax)
            return tuple(out)

        groups = {}
        for t in range(S):
            for i in range(nd):
                for j in range(nd):
                    o = int(D[t, j] - D[t, i])
                    k = int(np.searchsorted(offsets, o))
                    assert k < len(offsets) and offsets[k] == o
                    key = (k, disp(int(D[t, i])))
                    groups.setdefault(key, []).append((t, i, j))
        return groups, S, nc

    def assemble_vals_stencil(self, vertices, lset_vertex, struct):
        """Scatter-free one-pass assembly: SoA closed-form element values +
        windowed lattice adds into the DIA table (see `stencil_groups`).
        Ghost-penalty and identity streams remain scatter-adds (small).
        `struct` must be a `dia_structure` dict.  Returns (V (n_off, n),
        ncut)."""
        from ..ops.straightcut import eps_guard, eps_guard_list

        et = self.et
        d = ET_DIM[et]
        nv = d + 1
        nx = self.nx
        nv1 = nx + 1
        offsets = struct["offsets"]
        n_off = len(offsets)
        groups, S, nc = self._stencil_cache if hasattr(
            self, "_stencil_cache") else (None, None, None)
        if groups is None:
            groups, S, nc = self.stencil_groups(offsets)
            self._stencil_cache = (groups, S, nc)

        x, lv = _soa_corner_arrays(vertices, self.elements, lset_vertex)
        lv = eps_guard_list(lv)
        has_neg = lv[0] < 0
        has_pos = lv[0] > 0
        for v in lv[1:]:
            has_neg = has_neg | (v < 0)
            has_pos = has_pos | (v > 0)
        ncut = jnp.sum(has_neg & has_pos)

        det, Jinv = _soa_jacobian(x, d)
        A = cut_poisson_flat_soa(et, lv, det, Jinv, self.lam_nitsche)

        lat_shape = (n_off,) + (nv1,) * d
        V = jnp.zeros(lat_shape, dtype=vertices.dtype)
        for (k, dsp), combos in sorted(groups.items()):
            s = None
            for (t, i, j) in combos:
                term = A[i][j].reshape(nc, S)[:, t]
                s = term if s is None else s + term
            lat = s.reshape((nx,) * d)
            idx = (k,) + tuple(slice(dz, dz + nx) for dz in dsp)
            V = V.at[idx].add(lat)

        flat = V.reshape(-1)
        flat = flat.at[struct["gp_slots_soa"]].add(self.gp_flat_soa(vertices))
        idv = 1.0 - self.active_dof_mask(lset_vertex).astype(vertices.dtype)
        flat = flat.at[struct["diag_slots"]].add(idv)
        flat = flat * self._band_guard(lset_vertex, vertices.dtype)
        return flat.reshape(n_off, struct["n"]), ncut

    def gp_lattice_types(self, offsets):
        """Host: lattice plan for the ghost-penalty facet sweep.

        Interior facets of the structured mesh come in a handful of
        lattice-periodic types (12 on 3D tets, 3 on 2D trigs), each covering
        a full rectangular cube-window: facet = (elt (t1, cube c),
        elt (t2, cube c + dc)) for every valid c.  Returns a list of
        (t1, t2, dc, groups) where groups maps (diag k, row disp tuple) ->
        [(i, j)] patch-matrix entries (i, j in the stacked [T1; T2]
        Lagrange-dof order of `ghost_penalty_flat_soa`).
        """
        d = self.dim
        nx = self.nx
        nv1 = nx + 1
        p = np.asarray(self.p1dof2vertex, dtype=np.int64)
        e2d = p[self.space.el2dof_np]
        ne, nd = e2d.shape
        nc = nx ** d
        S = ne // nc
        D = e2d[:S]  # cube-0 rows ARE the displacements (base(0) = 0)
        f2e = self.mesh.facet2el_np
        ia = np.nonzero(f2e[:, 1] >= 0)[0]
        e1, e2 = f2e[ia, 0], f2e[ia, 1]
        c1, t1 = e1 // S, e1 % S
        c2, t2 = e2 // S, e2 % S

        def lat(c):
            out = []
            rem = np.asarray(c)
            for ax in range(d):
                out.append(rem // nx ** (d - 1 - ax))
                rem = rem % nx ** (d - 1 - ax)
            return np.stack(out, -1)

        dc = lat(c2) - lat(c1)
        keys = {}
        for i in range(len(e1)):
            keys.setdefault(
                (int(t1[i]), int(t2[i])) + tuple(int(v) for v in dc[i]), 0)
            keys[(int(t1[i]), int(t2[i])) + tuple(int(v) for v in dc[i])] += 1
        types = []
        for key, count in sorted(keys.items()):
            ta, tb = key[0], key[1]
            dlt = key[2:]
            exp = 1
            for dcomp in dlt:
                if dcomp < 0:
                    raise NotImplementedError("negative facet-type offset")
                exp *= nx - abs(dcomp)
            if exp != count:
                raise NotImplementedError("partial facet-type window")
            drow = sum(dlt[ax] * nv1 ** (d - 1 - ax) for ax in range(d))
            pd = [int(D[ta, i]) for i in range(nd)] + \
                 [drow + int(D[tb, i]) for i in range(nd)]

            def disp(v):
                out = []
                for ax in range(d):
                    out.append(int(v // nv1 ** (d - 1 - ax)))
                    v = v % nv1 ** (d - 1 - ax)
                return tuple(out)

            groups = {}
            for i in range(2 * nd):
                for j in range(2 * nd):
                    o = pd[j] - pd[i]
                    k = int(np.searchsorted(offsets, o))
                    assert k < len(offsets) and offsets[k] == o, o
                    groups.setdefault((k, disp(pd[i])), []).append((i, j))
            types.append((ta, tb, dlt, groups))
        return types

    def assemble_vals_lattice(self, vertices, lset_vertex, struct):
        """Gather-free lattice assembly: the fastest flagship path.

        Beyond `assemble_vals_stencil` (which already scatters nothing for
        the element stream), this variant also eliminates the per-corner
        GATHERS: after one permutation into vertex-lexicographic order, the
        corner coordinates/level-set values of every element type are plain
        shifted SLICES of the (nv1, ..) lattice views (measured: the 12+4
        corner gathers alone cost 89 ms at nx=48 — more than all arithmetic
        combined).  The closed-form kernel then runs on (S, nc) stacked
        slices.  Ghost-penalty/identity streams as in
        `assemble_vals_stencil`.
        """
        from ..ops.straightcut import eps_guard, eps_guard_list
        from ..integrate import vertex_local_ids

        et = self.et
        d = ET_DIM[et]
        nv = d + 1
        nx = self.nx
        nv1 = nx + 1
        offsets = struct["offsets"]
        n_off = len(offsets)
        if not hasattr(self, "_stencil_cache"):
            self._stencil_cache = self.stencil_groups(offsets)
        groups, S, nc = self._stencil_cache
        # corner-displacement table in element-corner order (stencil D is in
        # Lagrange dof order; corner c holds node vperm[c])
        p = np.asarray(self.p1dof2vertex, dtype=np.int64)
        D = (p[self.space.el2dof_np[:S]].reshape(S, nv)
             - 0)  # rows of the first cube ARE the displacements (base=0)
        vperm = vertex_local_ids(et, 1)

        def disp(v):
            out = []
            for ax in range(d):
                out.append(int(v // nv1 ** (d - 1 - ax)))
                v = v % nv1 ** (d - 1 - ax)
            return tuple(out)

        # `vertices`/`lset_vertex` are indexed by mesh VERTEX id, which on
        # the structured mesh is already lexicographic — the lattice views
        # are plain reshapes, no permutation gather at all
        vlat = vertices.reshape((nv1,) * d + (d,))
        llat = lset_vertex.reshape((nv1,) * d)

        def sl(dsp):
            return tuple(slice(dz, dz + nx) for dz in dsp)

        x = []
        lv = []
        for c in range(nv):
            node = int(vperm[c])
            dsps = [disp(int(D[t, node])) for t in range(S)]
            x.append([jnp.stack([vlat[sl(dsps[t]) + (a,)].reshape(-1)
                                 for t in range(S)]) for a in range(d)])
            lv.append(jnp.stack([llat[sl(dsps[t])].reshape(-1)
                                 for t in range(S)]))
        # raw-sign element activity BEFORE the eps guard — the identity-row
        # weights must follow the same raw sign convention as __init__ /
        # active_dof_mask (moved-radius equality is tested bit-for-bit)
        raw_neg = lv[0] < 0
        for v in lv[1:]:
            raw_neg = raw_neg | (v < 0)
        lv = eps_guard_list(lv)
        has_neg = lv[0] < 0
        has_pos = lv[0] > 0
        for v in lv[1:]:
            has_neg = has_neg | (v < 0)
            has_pos = has_pos | (v > 0)
        ncut = jnp.sum(has_neg & has_pos)

        det, Jinv = _soa_jacobian(x, d)
        A = cut_poisson_flat_soa(et, lv, det, Jinv, self.lam_nitsche)

        V = jnp.zeros((n_off,) + (nv1,) * d, dtype=vertices.dtype)
        for (k, dsp), combos in sorted(groups.items()):
            s = None
            for (t, i, j) in combos:
                term = A[i][j][t]
                s = term if s is None else s + term
            lat = s.reshape((nx,) * d)
            V = V.at[(k,) + sl(dsp)].add(lat)

        # ghost penalty: lattice facet-type sweep — corner coords are window
        # slices, the band mask is DEVICE-computed from the current lset
        # (re-marking with a moving level set costs nothing), and the
        # contributions are windowed adds (no gathers, no scatters)
        if not hasattr(self, "_gp_lattice_cache"):
            self._gp_lattice_cache = self.gp_lattice_types(offsets)
        cut_e = has_neg & has_pos          # (S, nc)
        cutL = [cut_e[t].reshape((nx,) * d) for t in range(S)]
        negL = [has_neg[t].reshape((nx,) * d) for t in range(S)]

        for (ta, tb, dlt, groups) in self._gp_lattice_cache:
            win = tuple(nx - dlt[ax] for ax in range(d))

            def wsl(extra):
                return tuple(slice(extra[ax], extra[ax] + win[ax])
                             for ax in range(d))

            def cdisp(t, c):
                node = int(vperm[c])
                v = int(D[t, node])
                out = []
                for ax in range(d):
                    out.append(int(v // nv1 ** (d - 1 - ax)))
                    v = v % nv1 ** (d - 1 - ax)
                return tuple(out)

            x1 = [[vlat[wsl(cdisp(ta, c)) + (a,)] for a in range(d)]
                  for c in range(nv)]
            x2 = [[vlat[wsl(tuple(cdisp(tb, c)[ax] + dlt[ax]
                                  for ax in range(d))) + (a,)]
                   for a in range(d)] for c in range(nv)]
            Agp = ghost_penalty_flat_soa(et, x1, x2, self.gamma_gp)
            w0 = tuple(slice(0, win[ax]) for ax in range(d))
            wd = tuple(slice(dlt[ax], dlt[ax] + win[ax]) for ax in range(d))
            mask = ((cutL[ta][w0] & negL[tb][wd])
                    | (cutL[tb][wd] & negL[ta][w0])).astype(vertices.dtype)
            for (k, dsp), ijs in sorted(groups.items()):
                s = None
                for (i, j) in ijs:
                    s = Agp[i][j] if s is None else s + Agp[i][j]
                tgt = (k,) + tuple(slice(dsp[ax], dsp[ax] + win[ax])
                                   for ax in range(d))
                V = V.at[tgt].add(s * mask)

        # identity rows for inactive dofs, LATTICE-NATIVE: a vertex dof is
        # active iff some incident element has a negative vertex, i.e. the
        # dilation of the per-type raw has_neg element lattices through the
        # corner-displacement slices.  The dof-indexed twin
        # (active_dof_mask + the diag_slots scatter) costs a 2.6M-index
        # scatter-max per assembly, which serializes on TPU and halved the
        # measured assembly rate (round-4 bench, 2026-08-20); 24 padded ORs
        # + one dense add into the diagonal DIA row replace it exactly
        # (diag_slots = idx0 * n + p puts dof i at V[idx0, vertex_pos(i)]).
        act = None
        for t in range(S):
            nl = raw_neg[t].reshape((nx,) * d)
            for c in range(nv):
                dsp = disp(int(D[t, int(vperm[c])]))
                pad = tuple((dsp[ax], 1 - dsp[ax]) for ax in range(d))
                a = jnp.pad(nl, pad)
                act = a if act is None else (act | a)
        idx0 = int(np.searchsorted(offsets, 0))
        V = V.at[idx0].add(1.0 - act.astype(vertices.dtype))
        return V.reshape(n_off, struct["n"]), ncut

    def gp_flat_soa(self, vertices):
        """SoA closed-form ghost-penalty values, flat (i, j, f) stream
        matching `gp_slots_soa` (see ghost_penalty_flat_soa)."""
        d = ET_DIM[self.et]
        nv = d + 1
        e1 = self.elements[self.gp_e1]
        e2 = self.elements[self.gp_e2]

        def corners(eidx):
            out = []
            for i in range(nv):
                rows = vertices[eidx[:, i]]
                out.append([rows[:, a] for a in range(d)])
            return out

        A = ghost_penalty_flat_soa(self.et, corners(e1), corners(e2),
                                   self.gamma_gp)
        n2 = 2 * nv
        return jnp.concatenate([A[i][j] for i in range(n2)
                                for j in range(n2)])

    def ell_gather_structure(self, struct):
        """Inverse slot map for scatter-free global assembly: for every flat
        ELL value slot, the (padded) list of indices into the concatenated
        [element matrices; identity rows] contribution stream.  Converts the
        scatter-add of `assemble_ell_vals` into gather+row-reduce (TPU
        scatters with duplicate indices serialize; gathers vectorize).
        Padded entries point one past the stream end, which the device code
        maps to a zero contribution.

        Only the element + identity streams go through the gather table (their
        multiplicity is bounded by the vertex valence, ~24 on 3D tets); the
        ghost-penalty stream piles O(100) facet contributions onto band
        diagonal slots, so it stays a scatter-add of a much smaller stream.
        """
        elm = np.asarray(struct["elm_slots"], dtype=np.int64)
        idr = np.asarray(struct["diag_slots"], dtype=np.int64)
        slots = np.concatenate([elm, idr])
        nstream = len(slots)
        nslots = struct["ell_cols"].shape[0] * struct["K"]
        counts = np.bincount(slots, minlength=nslots)
        M = int(counts.max()) if nstream else 1
        table = np.full((nslots, M), nstream, dtype=np.int32)  # pad -> zero
        order = np.argsort(slots, kind="stable")
        srt = slots[order]
        start = np.zeros(nslots + 1, dtype=np.int64)
        np.cumsum(counts, out=start[1:])
        pos = np.arange(nstream) - start[srt]
        table[srt, pos] = order.astype(np.int32)
        return table

    def assemble_ell_vals_gather(self, vertices, lset_vertex, cut_capacity,
                                 struct, gtable, block=None):
        """Scatter-free variant of `assemble_ell_vals` (see
        ell_gather_structure)."""
        A_std, A_cut, cut_ids, n = self.elmats_compact(
            vertices, lset_vertex, self.elements, cut_capacity,
            block=block,
        )
        A_all = A_std.at[cut_ids].add(A_cut)
        idv = 1.0 - self.active_dof_mask(lset_vertex).astype(vertices.dtype)
        stream = jnp.concatenate([
            A_all.reshape(-1),
            idv,  # dof-indexed identity weights (diag_slots order)
            jnp.zeros((1,), dtype=vertices.dtype),  # pad target
        ])
        vals = jnp.sum(stream[gtable], axis=1)
        # ghost penalty: small stream, high per-slot multiplicity -> scatter
        G = self.gp_mats(vertices, block=block)
        vals = vals.at[struct["gp_slots"]].add(G.reshape(-1))
        vals = vals * self._band_guard(lset_vertex, vertices.dtype)
        return vals.reshape(struct["ell_cols"].shape), n

    def assemble_ell_vals(self, vertices, lset_vertex, cut_capacity, struct,
                          block=None, mixed=False):
        """Device pipeline stage 1+2: element matrices -> global ELL values."""
        A_std, A_cut, cut_ids, n = self.elmats_compact(
            vertices, lset_vertex, self.elements, cut_capacity,
            block=block, mixed=mixed,
        )
        A_all = A_std.at[cut_ids].add(A_cut)
        G = self.gp_mats(vertices, block=block, mixed=mixed)
        nK = struct["ell_cols"].shape[0] * struct["K"]
        vals = jnp.zeros((nK,), dtype=vertices.dtype)
        vals = vals.at[struct["elm_slots"]].add(A_all.reshape(-1))
        vals = vals.at[struct["gp_slots"]].add(G.reshape(-1))
        idv = 1.0 - self.active_dof_mask(lset_vertex).astype(vertices.dtype)
        vals = vals.at[struct["diag_slots"]].add(idv)
        vals = vals * self._band_guard(lset_vertex, vertices.dtype)
        return vals.reshape(struct["ell_cols"].shape), n

    def assemble_ell_vals_soa(self, vertices, lset_vertex, cut_capacity,
                              struct, block=None):
        """SoA assembly: tile-padding-free standard tier + compacted cut tier.

        The AoS standard tier materializes (E, Q, nd, d) tensors which XLA
        tile-pads (nd, d) -> (8, 128) on TPU (~40-85x HBM blowup,
        docs/PERFORMANCE.md).  This path keeps every standard-tier array
        (E,)-shaped: coordinates gathered per corner, the affine Jacobian
        algebra unrolled into scalar-vector code, and the stiffness
        factorized through the constant reference tensor S[i,d,j,c] so no
        quadrature axis exists on device (exact for affine elements).
        Measured 13x faster than the AoS std tier at nx=48 f32 on v5e.

        `struct` must contain `elm_slots_soa` (flat (i, j, e)-ordered value
        slots) in addition to the `assemble_ell_vals` tables.  Accepts both
        ELL structures (`ell_structure`, value table (ndof, K)) and DIA
        structures (`dia_structure`, value table (n_off, ndof) in the
        vertex-lexicographic numbering — `offsets`/`n` keys present).
        """
        from ..ops.straightcut import eps_guard, eps_guard_list

        et = self.et
        d = ET_DIM[et]
        nd = self.nd
        elements = self.elements
        ne = elements.shape[0]
        S_np = _affine_stiffness_S(et, self.order)

        x, lv = _soa_corner_arrays(vertices, elements, lset_vertex)
        lv = eps_guard_list(lv)
        has_neg = lv[0] < 0
        has_pos = lv[0] > 0
        for v in lv[1:]:
            has_neg = has_neg | (v < 0)
            has_pos = has_pos | (v > 0)
        cut = has_neg & has_pos
        neg_uncut = has_neg & ~has_pos
        ncut = jnp.sum(cut)
        cut_ids = jnp.nonzero(cut, size=cut_capacity, fill_value=0)[0]
        cmask = (jnp.arange(cut_capacity) < ncut).astype(vertices.dtype)

        det, Jinv = _soa_jacobian(x, d)
        flat_std = _std_stiffness_soa_flat(
            et, self.order, S_np, det, Jinv,
            neg_uncut.astype(vertices.dtype))

        if "offsets" in struct:
            out_shape = (len(struct["offsets"]), struct["n"])
        else:
            out_shape = tuple(struct["ell_cols"].shape)
        nK = out_shape[0] * out_shape[1]
        vals = jnp.zeros((nK,), dtype=vertices.dtype)
        vals = vals.at[struct["elm_slots_soa"]].add(flat_std)

        # cut tier: the full cut kernel on the fixed-capacity compaction
        # (cap << ne, so its AoS tile padding stays bounded)
        cels = jnp.asarray(elements)[cut_ids]
        ccoords = vertices[cels]
        cvals = eps_guard(lset_vertex[cels])
        cut_fn = lambda c_b, v_b: cut_poisson_elmats(
            et, self.order, c_b, v_b, self.lam_nitsche)
        A_cut = (cut_fn(ccoords, cvals) if block is None
                 else _map_blocks(cut_fn, block, ccoords, cvals))
        A_cut = A_cut * cmask[:, None, None]
        slots_cut = jnp.asarray(struct["elm_slots"]).reshape(
            ne, nd * nd)[cut_ids]
        vals = vals.at[slots_cut.reshape(-1)].add(A_cut.reshape(-1))

        G = self.gp_mats(vertices, block=block)
        vals = vals.at[struct["gp_slots"]].add(G.reshape(-1))
        idv = 1.0 - self.active_dof_mask(lset_vertex).astype(vertices.dtype)
        vals = vals.at[struct["diag_slots"]].add(idv)
        vals = vals * self._band_guard(lset_vertex, vertices.dtype)
        return vals.reshape(out_shape), ncut

    def assemble_vals_soa1(self, vertices, lset_vertex, struct):
        """Fully SoA one-pass global assembly (P1 simplices only).

        Uses `cut_poisson_flat_soa`: a single masked-pattern sweep computes
        std-tier AND cut-tier element values as (E,) vectors (no compaction,
        no cut capacity, no quadrature tensors), scattered once through
        `elm_slots_soa`.  Accepts ELL and DIA structures like
        `assemble_ell_vals_soa`.  Returns (value table, ncut).
        """
        from ..ops.straightcut import eps_guard, eps_guard_list

        et = self.et
        if self.order != 1 or et not in ("trig", "tet"):
            raise NotImplementedError("one-pass SoA assembly is P1-simplex")
        d = ET_DIM[et]
        nv = d + 1
        elements = self.elements

        x, lv = _soa_corner_arrays(vertices, elements, lset_vertex)
        lv = eps_guard_list(lv)
        has_neg = lv[0] < 0
        has_pos = lv[0] > 0
        for v in lv[1:]:
            has_neg = has_neg | (v < 0)
            has_pos = has_pos | (v > 0)
        ncut = jnp.sum(has_neg & has_pos)

        det, Jinv = _soa_jacobian(x, d)
        A = cut_poisson_flat_soa(et, lv, det, Jinv, self.lam_nitsche)
        flat = jnp.concatenate([A[i][j] for i in range(nv)
                                for j in range(nv)])

        if "offsets" in struct:
            out_shape = (len(struct["offsets"]), struct["n"])
        else:
            out_shape = tuple(struct["ell_cols"].shape)
        nK = out_shape[0] * out_shape[1]
        vals = jnp.zeros((nK,), dtype=vertices.dtype)
        vals = vals.at[struct["elm_slots_soa"]].add(flat)
        G = self.gp_mats(vertices)
        vals = vals.at[struct["gp_slots"]].add(G.reshape(-1))
        idv = 1.0 - self.active_dof_mask(lset_vertex).astype(vertices.dtype)
        vals = vals.at[struct["diag_slots"]].add(idv)
        vals = vals * self._band_guard(lset_vertex, vertices.dtype)
        return vals.reshape(out_shape), ncut

    def gp_mats(self, vertices, block=None, mixed=False):
        coords1 = vertices[self.elements[self.gp_e1]]
        coords2 = vertices[self.elements[self.gp_e2]]
        if block is None:
            return ghost_penalty_elmats(self.et, self.order, coords1, coords2,
                                        self.gamma_gp, mixed=mixed)
        return _map_blocks(
            lambda c1, c2: ghost_penalty_elmats(self.et, self.order, c1, c2,
                                                self.gamma_gp, mixed=mixed),
            block, coords1, coords2)

    def apply(self, vertices, lset_vertex, x):
        """Matrix-free A @ x (assemble-and-apply in one fused program)."""
        A = self.elmats(vertices, lset_vertex)
        xe = x[self.el2dof]
        ye = jnp.einsum("eij,ej->ei", A, xe)
        y = jnp.zeros_like(x).at[self.el2dof.reshape(-1)].add(ye.reshape(-1))
        G = self.gp_mats(vertices)
        dmap = np.concatenate([self.el2dof[self.gp_e1], self.el2dof[self.gp_e2]],
                              axis=1)
        xf = x[dmap]
        yf = jnp.einsum("fij,fj->fi", G, xf)
        y = y.at[dmap.reshape(-1)].add(yf.reshape(-1))
        act = self.active_dof_mask(lset_vertex)  # runtime, not init-frozen
        return jnp.where(act, y, x) * self._band_guard(lset_vertex, x.dtype)

    def rhs(self, vertices, lset_vertex, f_fn):
        coords = vertices[self.elements]
        vals = lset_vertex[self.elements]
        fe = cut_poisson_rhs_elvecs(self.et, self.order, coords, vals, f_fn)
        b = jnp.zeros((self.ndof,), dtype=vertices.dtype)
        b = b.at[self.el2dof.reshape(-1)].add(fe.reshape(-1))
        return jnp.where(self.active_dof_mask(lset_vertex), b, 0.0)

    def solve(self, f_fn=None, maxiter=200, tol=1e-8):
        """Single-chip end-to-end: assemble + CG, one jitted program."""
        f_fn = f_fn or (lambda p: jnp.ones(p.shape[:-1], dtype=p.dtype))

        @jax.jit
        def run(vertices, lset_vertex):
            b = self.rhs(vertices, lset_vertex, f_fn)
            mv = lambda x: self.apply(vertices, lset_vertex, x)
            x, k, res = cg(mv, b, maxiter=maxiter, tol=tol)
            return x, k, res

        return run(self.vertices, self.lset)

    # -- SPMD, dof-sharded ----------------------------------------------------
    def spmd_step_sharded(self, n_devices=None, devices=None, maxiter=25):
        """Dof-sharded SPMD assembly+CG: interior dofs live on their chunk's
        device with zero communication; only the shared (halo-layer) buffer is
        psum-reduced per matvec (SURVEY §2.8; parallel/halo.py).  Unlike
        `spmd_step`, the collective payload is proportional to the halo, not
        to ndof.

        Returns (jitted step fn, args, merge) where merge(x_int, x_sh) gives
        the global dof vector.
        """
        from ..parallel.halo import DofPartition
        from ..solvers.krylov import cg

        devices = devices if devices is not None else jax.devices()[:n_devices]
        n = len(devices)
        dm = DeviceMesh(np.array(devices), ("e",))
        ne = self.mesh.ne
        # plane-aligned slab partition: chunk boundaries coincide with cell
        # planes of the structured mesh, so each boundary shares exactly one
        # vertex plane — the minimal halo for a 1D device mesh
        npl = self.nx
        elems_per_plane = ne // npl
        plane_of_elem = np.minimum(np.arange(ne) // elems_per_plane, npl - 1)
        chunk_of_elem = ((plane_of_elem * n) // npl).astype(np.int32)
        counts = np.bincount(chunk_of_elem, minlength=n)
        Ec = max(int(counts.max()), 1)
        epad = np.zeros((n, Ec), dtype=np.int64)
        pflag = np.ones((n, Ec))
        off = np.zeros(n, dtype=np.int64)
        order_e = np.argsort(chunk_of_elem, kind="stable")
        pos = 0
        for c in range(n):
            ids = order_e[pos:pos + counts[c]]
            pos += counts[c]
            epad[c, :len(ids)] = ids
            pflag[c, :len(ids)] = 0.0
        epad = epad.reshape(-1)
        pflag = pflag.reshape(-1)
        ne_pad = n * Ec
        chunk_of_row = np.repeat(np.arange(n, dtype=np.int32), Ec)

        # ghost-penalty facet rows grouped by the chunk of their first element
        F = len(self.gp_e1)
        fd_g = np.concatenate(
            [self.space.el2dof_np[self.gp_e1], self.space.el2dof_np[self.gp_e2]],
            axis=1) if F else np.zeros((0, 2 * self.nd), np.int32)
        cf = chunk_of_elem[self.gp_e1] if F else np.zeros(0, np.int32)
        order = np.argsort(cf, kind="stable")
        counts = np.bincount(cf, minlength=n)
        Fc = max(int(counts.max()), 1) if F else 1
        gpsel = np.full((n, Fc), -1, dtype=np.int64)
        off = 0
        for c in range(n):
            gpsel[c, :counts[c]] = order[off:off + counts[c]]
            off += counts[c]
        gpflat = gpsel.reshape(-1)
        fflag = (gpflat < 0).astype(np.float64)
        gpflat = np.where(gpflat < 0, 0, gpflat)

        part = DofPartition(
            self.ndof,
            [self.space.el2dof_np, fd_g] if F else [self.space.el2dof_np],
            [chunk_of_elem, cf] if F else [chunk_of_elem],
            n,
        )
        Ni, S = part.Ni_max, part.S
        e2d_l = np.zeros((ne_pad, self.nd), np.int32)
        real_e = pflag == 0
        e2d_l[real_e] = part.localize_rows(
            self.space.el2dof_np[epad[real_e]], chunk_of_row[real_e])
        fd_l = np.zeros((n * Fc, 2 * self.nd), np.int32)
        if F:
            real = fflag == 0
            fd_l[real] = part.localize_rows(
                fd_g[gpflat[real]], np.repeat(np.arange(n, dtype=np.int32), Fc)[real])

        coords_all = self.mesh.vertices_np[self.mesh.elements_np[epad]]
        vals_all = self.lset_np[self.mesh.elements_np[epad]].copy()
        vals_all[pflag > 0] = 1.0
        nvel = self.mesh.elements_np.shape[1]  # geometry corners, NOT nd
        c1 = self.mesh.vertices_np[self.mesh.elements_np[self.gp_e1[gpflat]]] \
            if F else np.zeros((n * Fc, nvel, self.dim))
        c2 = self.mesh.vertices_np[self.mesh.elements_np[self.gp_e2[gpflat]]] \
            if F else np.zeros((n * Fc, nvel, self.dim))

        act = self.active_dofs
        act_int, act_sh = part.split_vector(act)
        bfull = np.where(act, 1.0, 0.0)
        b_int, b_sh = part.split_vector(bfull)

        et, pord, nd = self.et, self.order, self.nd
        lam, gamma = self.lam_nitsche, self.gamma_gp

        def body(coords, vals, e2dl, pfl, cc1, cc2, fdl, ffl,
                 ai, bi, ash, bsh):
            ai = ai.astype(bool)
            ash = ash.astype(bool)

            def mv(x):
                xi, xs = x[:Ni], x[Ni:]
                A = cut_poisson_elmats(et, pord, coords, vals, lam)
                A = A * (1.0 - pfl[:, None, None])
                xe = jnp.concatenate([xi, xs])[e2dl]
                ye = jnp.einsum("eij,ej->ei", A, xe)
                buf = jnp.zeros((Ni + S,), dtype=x.dtype)
                buf = buf.at[e2dl.reshape(-1)].add(ye.reshape(-1))
                G = ghost_penalty_elmats(et, pord, cc1, cc2, gamma)
                G = G * (1.0 - ffl[:, None, None])
                xf = jnp.concatenate([xi, xs])[fdl]
                yf = jnp.einsum("fij,fj->fi", G, xf)
                buf = buf.at[fdl.reshape(-1)].add(yf.reshape(-1))
                yi = buf[:Ni]
                ys = jax.lax.psum(buf[Ni:], "e")  # payload = S (halo), not ndof
                yi = jnp.where(ai, yi, xi)
                ys = jnp.where(ash, ys, xs)
                return jnp.concatenate([yi, ys])

            def dots(a, b):
                hp = jax.lax.Precision.HIGHEST  # TPU default dot is bf16
                return (jax.lax.psum(jnp.vdot(a[:Ni], b[:Ni], precision=hp),
                                     "e")
                        + jnp.vdot(a[Ni:], b[Ni:], precision=hp))

            b = jnp.concatenate([bi, bsh])
            x = jnp.zeros_like(b)
            r = b - mv(x)
            p = r
            rs = dots(r, r)

            def it(_, st):
                x, r, p, rs = st
                q = mv(p)
                alpha = rs / dots(p, q)
                x = x + alpha * p
                r = r - alpha * q
                rs2 = dots(r, r)
                p = r + (rs2 / rs) * p
                return x, r, p, rs2

            x, r, p, rs = jax.lax.fori_loop(0, maxiter, it, (x, r, p, rs))
            return x[:Ni], x[Ni:], jnp.sqrt(rs)

        sharded = shard_map(
            body, mesh=dm,
            in_specs=(P("e"), P("e"), P("e"), P("e"), P("e"), P("e"), P("e"),
                      P("e"), P("e"), P("e"), P(), P()),
            out_specs=(P("e"), P(), P()),
            check_vma=False,  # x_sh/res are psum-replicated through the CG loop
        )
        jstep = jax.jit(sharded)
        dt = self.dtype
        args = (
            jnp.asarray(coords_all, dtype=dt),
            jnp.asarray(vals_all, dtype=dt),
            jnp.asarray(e2d_l),
            jnp.asarray(pflag, dtype=dt),
            jnp.asarray(c1, dtype=dt),
            jnp.asarray(c2, dtype=dt),
            jnp.asarray(fd_l),
            jnp.asarray(fflag, dtype=dt),
            jnp.asarray(act_int.reshape(-1).astype(dt)),
            jnp.asarray(b_int.reshape(-1), dtype=dt),
            jnp.asarray(act_sh.astype(dt)),
            jnp.asarray(b_sh, dtype=dt),
        )

        def merge(x_int, x_sh):
            return part.merge_vector(
                np.asarray(x_int).reshape(n, Ni), np.asarray(x_sh))

        return jstep, args, merge

    # -- SPMD ----------------------------------------------------------------
    def spmd_step(self, n_devices=None, devices=None):
        """Element-sharded assembly + psum dof reduction + CG — the full
        multi-chip step (SURVEY.md §2.8: element-batch DP over ICI).

        Returns (jitted step fn, example args).
        """
        devices = devices if devices is not None else jax.devices()[:n_devices]
        n = len(devices)
        dm = DeviceMesh(np.array(devices), ("e",))

        ne = self.mesh.ne
        pad = (-ne) % n
        elements = np.concatenate(
            [self.mesh.elements_np, np.repeat(self.mesh.elements_np[:1], pad, 0)], 0
        )
        el2dof = np.concatenate(
            [self.space.el2dof_np, np.repeat(self.space.el2dof_np[:1], pad, 0)], 0
        )
        # padded elements: force level-set values positive => zero contribution
        pad_flag = np.zeros(len(elements), dtype=bool)
        pad_flag[ne:] = True

        nf = len(self.gp_facets)
        padf = (-nf) % n if nf else n
        gp_e1 = np.concatenate([self.gp_e1, np.repeat(self.gp_e1[:1] if nf else [0], padf)])
        gp_e2 = np.concatenate([self.gp_e2, np.repeat(self.gp_e2[:1] if nf else [0], padf)])
        fpad_flag = np.zeros(len(gp_e1), dtype=bool)
        fpad_flag[nf:] = True

        et, order, nd = self.et, self.order, self.nd
        lam, gamma = self.lam_nitsche, self.gamma_gp
        active = self.active_dofs

        def partial_apply(coords, vals, e2d, pflag, c1, c2, fd, fflag, x):
            A = cut_poisson_elmats(et, order, coords, vals, lam)
            A = A * (1.0 - pflag[:, None, None])
            ye = jnp.einsum("eij,ej->ei", A, x[e2d])
            y = jnp.zeros_like(x).at[e2d.reshape(-1)].add(ye.reshape(-1))
            G = ghost_penalty_elmats(et, order, c1, c2, gamma)
            G = G * (1.0 - fflag[:, None, None])
            yf = jnp.einsum("fij,fj->fi", G, x[fd])
            y = y.at[fd.reshape(-1)].add(yf.reshape(-1))
            return jax.lax.psum(y, "e")

        sharded_apply = shard_map(
            partial_apply,
            mesh=dm,
            in_specs=(P("e"), P("e"), P("e"), P("e"), P("e"), P("e"), P("e"),
                      P("e"), P()),
            out_specs=P(),
        )

        coords_all = self.mesh.vertices_np[elements].astype(np.float32
                                                            if self.dtype == jnp.float32
                                                            else np.float64)
        vals_all = self.lset_np[elements]
        vals_all[pad_flag] = 1.0  # padded -> pure POS, no contribution
        c1 = self.mesh.vertices_np[self.mesh.elements_np[gp_e1]]
        c2 = self.mesh.vertices_np[self.mesh.elements_np[gp_e2]]
        fd = np.concatenate(
            [self.space.el2dof_np[gp_e1], self.space.el2dof_np[gp_e2]], axis=1
        )

        args = (
            jnp.asarray(coords_all, dtype=self.dtype),
            jnp.asarray(vals_all, dtype=self.dtype),
            jnp.asarray(el2dof),
            jnp.asarray(pad_flag, dtype=self.dtype),
            jnp.asarray(c1, dtype=self.dtype),
            jnp.asarray(c2, dtype=self.dtype),
            jnp.asarray(fd),
            jnp.asarray(fpad_flag, dtype=self.dtype),
        )

        def step(coords, vals, e2d, pflag, cc1, cc2, fdd, fflag, b):
            def mv(x):
                y = sharded_apply(coords, vals, e2d, pflag, cc1, cc2, fdd, fflag, x)
                return jnp.where(active, y, x)

            x, k, res = cg(mv, b, maxiter=25, tol=1e-8)
            return x, res

        b = jnp.where(active, 1.0, 0.0).astype(self.dtype)
        jstep = jax.jit(step)
        return jstep, args + (b,)
