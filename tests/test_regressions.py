"""Round-3 regression tests for the round-2 advisor findings (ADVICE.md):

1. stale P1 level-set geometry on re-Assemble after updating a non-P1
   level set (reference re-runs CF2GFForStraightCutRule per assembly),
2. mesh.Refine() on meshes with periodic identification,
3. BND integrals under an active mesh deformation,
4. MultiGridCL coarse solve on a non-SPD block (LU fallback, no silent NaNs),
5. ScalarTimeFE.IsNodeActive bound check.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from ngsxfem_tpu import (
    NEG, POS, IF, H1, VectorH1, BilinearForm, LinearForm, SymbolicBFI,
    SymbolicLFI, GridFunction, InterpolateToP1, MakeStructured2DMesh,
    CoefficientFunction, x, y, VOL, BND,
)


def _neg_area_via_mass(mesh, lset_ho):
    V = H1(mesh, order=1)
    u, v = V.TnT()
    a = BilinearForm(V)
    a += SymbolicBFI(levelset_domain={"levelset": lset_ho, "domain_type": NEG},
                     form=u * v)
    a.Assemble()
    one = np.ones(V.ndof)
    return float(one @ np.asarray(a.mat.todense()) @ one), a


def test_reassemble_after_levelset_update():
    """Updating a non-P1 level set and re-assembling must re-interpolate the
    P1 geometry (ADVICE r2 medium: stale `_ensure_p1_ld` cache)."""
    mesh = MakeStructured2DMesh(quads=False, nx=16, ny=16)
    Vho = H1(mesh, order=3)
    lset_ho = GridFunction(Vho)
    lset_ho.Set((x - 0.5) ** 2 + (y - 0.5) ** 2 - 0.25 ** 2)

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        area1, a = _neg_area_via_mass(mesh, lset_ho)
        assert abs(area1 - np.pi * 0.25 ** 2) < 8e-3  # P1 geometry, h=1/16

        # grow the circle and re-assemble THE SAME form object
        lset_ho.Set((x - 0.5) ** 2 + (y - 0.5) ** 2 - 0.4 ** 2)
        a.Assemble()
        one = np.ones(a.space.ndof)
        area2 = float(one @ np.asarray(a.mat.todense()) @ one)
    assert abs(area2 - np.pi * 0.4 ** 2) < 8e-3, (
        "re-Assemble reused stale P1 level-set geometry")


def test_refine_periodic_mesh_guard():
    """Refine() must not leave a stale periodic facet identification
    (ADVICE r2 low: broadcast crash in GetFacetsWithNeighborTypes)."""
    mesh = MakeStructured2DMesh(quads=False, nx=4, ny=4, periodic="x")
    assert (mesh.periodic_facet_np >= 0).any()
    with pytest.raises(NotImplementedError):
        mesh.Refine()

    # non-periodic refine keeps the identification array consistent
    m2 = MakeStructured2DMesh(quads=False, nx=4, ny=4)
    m2.Refine()
    assert len(m2.periodic_facet_np) == m2.nfacets
    assert (m2.periodic_facet_np == -1).all()


def test_bnd_integral_sees_deformation():
    """BND integrals under SetDeformation integrate over the DEFORMED
    boundary (ADVICE r2 low: _boundary_ctx ignored the deformation)."""
    mesh = MakeStructured2DMesh(quads=False, nx=4, ny=4)
    Vd = VectorH1(mesh, order=1)
    deform = GridFunction(Vd)
    # linear stretch x -> 1.25 x: perimeter 4 -> 2*(1.25 + 1) = 4.5
    deform.Set(CoefficientFunction((0.25 * x, 0.0 * y)))

    V = H1(mesh, order=1)
    u, v = V.TnT()
    f = LinearForm(V)
    f += SymbolicLFI(form=v, VOL_or_BND=BND)
    mesh.SetDeformation(deform)
    try:
        f.Assemble()
    finally:
        mesh.UnsetDeformation()
    per = float(np.sum(np.asarray(f.vec)))
    assert abs(per - 4.5) < 1e-12, per

    # undeformed reference check
    f2 = LinearForm(V)
    f2 += SymbolicLFI(form=v, VOL_or_BND=BND)
    f2.Assemble()
    per0 = float(np.sum(np.asarray(f2.vec)))
    assert abs(per0 - 4.0) < 1e-12


def test_mg_coarse_solve_indefinite():
    """Non-SPD coarse block: LU fallback instead of silent NaNs
    (ADVICE r2 low: unchecked device cholesky)."""
    from ngsxfem_tpu.solvers.mg import MultiGridCL
    from ngsxfem_tpu.solvers.sparse import SparseMatrix

    # indefinite 2x2: diag(1, -1)
    A = SparseMatrix(np.array([0, 1]), np.array([0, 1]),
                     jnp.asarray([1.0, -1.0]), (2, 2))
    mg = MultiGridCL([A], [], [None])
    b = jnp.asarray([2.0, 3.0])
    xsol = np.asarray(mg(b))
    assert np.all(np.isfinite(xsol))
    assert np.allclose(xsol, [2.0, -3.0], atol=1e-12)


def test_timefe_node_bounds():
    from ngsxfem_tpu.spacetime.timefe import ScalarTimeFE

    fe = ScalarTimeFE(2)
    assert all(fe.IsNodeActive(i) for i in range(3))
    with pytest.raises(IndexError):
        fe.IsNodeActive(3)
    with pytest.raises(IndexError):
        fe.IsNodeActive(-1)


@pytest.mark.parametrize("dom", ["NEG", "POS"])
def test_two_tier_assembly_equivalence(dom):
    """Two-tier compacted cut assembly (public BilinearForm path) matches the
    single-tier full-cut-kernel path to roundoff on the fictdom workload
    (VERDICT r2 item 3; model: models/poisson.py elmats_compact)."""
    from ngsxfem_tpu import (
        CutInfo, HASNEG, GetFacetsWithNeighborTypes, GetDofsOfElements,
        sqrt, grad, specialcf, Norm,
    )
    from ngsxfem_tpu.config import config
    from ngsxfem_tpu.forms import assemble as asm

    def build(two_tier):
        config.two_tier_assembly = two_tier
        asm._ASM_CACHE.clear()
        mesh = MakeStructured2DMesh(quads=False, nx=12, ny=12)
        lsetp1 = GridFunction(H1(mesh, order=1))
        InterpolateToP1(sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2) - 0.3, lsetp1)
        ci = CutInfo(mesh, lsetp1)
        hasneg = ci.GetElementsOfType(HASNEG)
        V = H1(mesh, order=2, dgjumps=True)
        u, v = V.TnT()
        h = specialcf.mesh_size
        n_lset = 1.0 / Norm(grad(lsetp1)) * grad(lsetp1)
        ld_neg = {"levelset": lsetp1,
                  "domain_type": NEG if dom == "NEG" else POS}
        ld_if = {"levelset": lsetp1, "domain_type": IF}
        a = BilinearForm(V)
        a += SymbolicBFI(ld_neg, form=grad(u) * grad(v),
                         definedonelements=None if dom == "POS" else hasneg)
        a += SymbolicBFI(ld_if, form=-(grad(u) * n_lset) * v
                         - (grad(v) * n_lset) * u + 20.0 / h * u * v)
        a.Assemble()
        f = LinearForm(V)
        f += SymbolicLFI(ld_neg, form=v, definedonelements=hasneg)
        f.Assemble()
        return np.asarray(a.mat.todense()), np.asarray(f.vec)

    try:
        A1, f1 = build(False)
        A2, f2 = build(True)
    finally:
        config.two_tier_assembly = True
        asm._ASM_CACHE.clear()
    scale = np.abs(A1).max()
    assert np.abs(A2 - A1).max() < 1e-11 * scale, np.abs(A2 - A1).max()
    assert np.abs(f2 - f1).max() < 1e-12 * np.abs(f1).max()


def test_newton_fallback_pathological_deformation():
    """Fixed-iteration Newton searches detect non-convergence and fall back
    (VERDICT r2 item 8; reference symboliccutbfi.cpp:1184-1199 warns + uses
    a low-order rule): a wild deformation must not produce NaNs/garbage."""
    from ngsxfem_tpu import SymbolicFacetPatchBFI, specialcf
    from ngsxfem_tpu.lsetcurv.shifted import shifted_eval

    mesh = MakeStructured2DMesh(quads=False, nx=4, ny=4)
    Vd = VectorH1(mesh, order=2)
    deform = GridFunction(Vd)
    rng = np.random.default_rng(0)
    # displacement ~5x the mesh size, randomly folded: Newton cannot converge
    deform.vec.data = jnp.asarray(rng.normal(scale=1.25, size=Vd.ndof))

    V = H1(mesh, order=1, dgjumps=True)
    u, v = V.TnT()
    a = BilinearForm(V)
    a += SymbolicBFI(form=u * v)  # keep a volume term so the matrix is PD-ish
    h = specialcf.mesh_size
    a += SymbolicFacetPatchBFI(form=1.0 / (h * h) * (u - u.Other())
                               * (v - v.Other()), deformation=deform)
    a.Assemble()
    A = np.asarray(a.mat.todense())
    assert np.all(np.isfinite(A)), "facet-patch Newton fallback failed"

    # shifted_eval through the same wild deformation: finite everywhere
    gf = GridFunction(H1(mesh, order=2))
    gf.Set(x * x + y)
    from ngsxfem_tpu import Integrate

    val = Integrate(cf=shifted_eval(gf, back=deform), mesh=mesh, order=3)
    assert np.isfinite(val)


def test_newton_nonconvergence_warnings_trigger():
    """The non-convergence DIAGNOSTICS actually fire (VERDICT r3 item 7 /
    r2 item 8: the warnings existed but nothing triggered them): with
    ``config.newton_debug`` on, a pathological deformation provably fails
    the fixed-iteration facet-patch map and shifted_eval point search, the
    NewtonNonConvergenceWarning is raised from the running program, and the
    documented fallback still produces finite results."""
    import warnings

    import jax

    from ngsxfem_tpu import Integrate, SymbolicFacetPatchBFI, specialcf
    from ngsxfem_tpu.config import config
    from ngsxfem_tpu.lsetcurv.shifted import shifted_eval
    from ngsxfem_tpu.utils.diagnostics import NewtonNonConvergenceWarning

    # nx=5: a signature no other test assembles, so the debug-flagged
    # trace is fresh (the assembly program cache is signature-keyed)
    mesh = MakeStructured2DMesh(quads=False, nx=5, ny=5)
    Vd = VectorH1(mesh, order=2)
    deform = GridFunction(Vd)
    rng = np.random.default_rng(0)
    # displacement ~5x the mesh size, randomly folded: Newton cannot
    # converge for a large fraction of the patch points
    deform.vec.data = jnp.asarray(rng.normal(scale=1.25, size=Vd.ndof))

    config.newton_debug = True
    try:
        V = H1(mesh, order=1, dgjumps=True)
        u, v = V.TnT()
        a = BilinearForm(V)
        a += SymbolicBFI(form=u * v)
        h = specialcf.mesh_size
        a += SymbolicFacetPatchBFI(
            form=1.0 / (h * h) * (u - u.Other()) * (v - v.Other()),
            deformation=deform)
        with pytest.warns(NewtonNonConvergenceWarning,
                          match="facet-patch Newton map"):
            a.Assemble()
            A = np.asarray(a.mat.todense())
            jax.effects_barrier()  # flush the debug callback
        assert np.all(np.isfinite(A))

        gf = GridFunction(H1(mesh, order=2))
        gf.Set(x * x + y)
        with pytest.warns(NewtonNonConvergenceWarning,
                          match="shifted_eval Newton"):
            val = Integrate(cf=shifted_eval(gf, back=deform), mesh=mesh,
                            order=3)
            jax.effects_barrier()
        assert np.isfinite(val)
    finally:
        config.newton_debug = False


def test_isoparametric_shift_warning_trigger():
    """The isoparametric-shift Newton warning (lsetcurv.py, reference
    symboliccutbfi.cpp:1184-1192 analog) fires on a level set whose
    gradient degenerates on the zero line, and the resulting deformation is
    still finite and threshold-clamped (the documented fallback)."""
    from ngsxfem_tpu import LevelSetMeshAdaptation, sin
    from ngsxfem_tpu.utils.diagnostics import NewtonNonConvergenceWarning

    mesh = MakeStructured2DMesh(quads=False, nx=5, ny=5)
    threshold = 10.0
    lsa = LevelSetMeshAdaptation(mesh, order=3, threshold=threshold)
    # (x-1/2)^3: zero gradient ON the interface -> the fixed-iteration
    # nodal Newton stalls; the sin(40y) term keeps the band 2D-cut
    with pytest.warns(NewtonNonConvergenceWarning,
                      match="isoparametric shift"):
        deform = lsa.CalcDeformation((x - 0.5) ** 3 + 0.01 * sin(40 * y))
    d = np.asarray(deform._arr if hasattr(deform, "_arr") else
                   deform.vec.data).reshape(-1)
    assert np.all(np.isfinite(d))
    h = 1.0 / 5
    assert np.max(np.abs(d)) <= threshold * h + 1e-12


def test_moving_band_no_recompile():
    """A moving interface with per-step re-marked element + ghost-penalty
    facet selections reuses the compiled assembly program: constant jit-cache
    size across steps (VERDICT r2 item 7; reference re-assembly loop of
    py_tutorials/moving_domain.py)."""
    from ngsxfem_tpu import (
        CutInfo, HASNEG, GetFacetsWithNeighborTypes, sqrt, grad, specialcf,
    )
    from ngsxfem_tpu.forms import assemble as asm

    mesh = MakeStructured2DMesh(quads=False, nx=12, ny=12)
    Vl = H1(mesh, order=1)
    lsetp1 = GridFunction(Vl)  # reused across steps (time-stepping pattern)
    V = H1(mesh, order=1, dgjumps=True)
    u, v = V.TnT()
    h = specialcf.mesh_size

    asm._ASM_CACHE.clear()
    sizes, mats = [], []
    for step in range(4):
        c = 0.4 + 0.015 * step
        InterpolateToP1(sqrt((x - c) ** 2 + (y - 0.5) ** 2) - 0.22, lsetp1)
        ci = CutInfo(mesh, lsetp1)
        hasneg = ci.GetElementsOfType(HASNEG)
        hasif = ci.GetElementsOfType(IF)
        band = GetFacetsWithNeighborTypes(mesh, a=hasneg, b=hasif)
        from ngsxfem_tpu import SymbolicFacetPatchBFI

        a = BilinearForm(V)
        a += SymbolicBFI({"levelset": lsetp1, "domain_type": NEG},
                         form=grad(u) * grad(v), definedonelements=hasneg)
        a += SymbolicFacetPatchBFI(form=0.1 / (h * h) * (u - u.Other())
                                   * (v - v.Other()), definedonelements=band)
        a.Assemble()
        sizes.append(len(asm._ASM_CACHE))
        mats.append(np.asarray(a.mat.todense()))
    # first step compiles; every further step reuses the same signature
    assert sizes[0] == sizes[1] == sizes[2] == sizes[3], sizes
    # matrices genuinely differ across steps (the band really moved)
    assert np.abs(mats[0] - mats[3]).max() > 1e-8

    # correctness: the cached dynamic-selection program matches a cold build
    asm._ASM_CACHE.clear()
    a2 = BilinearForm(V)
    a2 += SymbolicBFI({"levelset": lsetp1, "domain_type": NEG},
                      form=grad(u) * grad(v),
                      definedonelements=ci.GetElementsOfType(HASNEG))
    from ngsxfem_tpu import SymbolicFacetPatchBFI

    a2 += SymbolicFacetPatchBFI(form=0.1 / (h * h) * (u - u.Other())
                                * (v - v.Other()), definedonelements=band)
    a2.Assemble()
    A2 = np.asarray(a2.mat.todense())
    assert np.abs(A2 - mats[3]).max() < 1e-12 * max(1.0, np.abs(A2).max())


def test_asm_cache_lru_bounded():
    """_ASM_CACHE is LRU-bounded (VERDICT r2 weak 7: unbounded growth over
    parameter sweeps was the XLA:CPU vm.max_map_count failure mode) and
    re-assembly after eviction still produces correct results."""
    from ngsxfem_tpu.forms import assemble as asm
    from ngsxfem_tpu.jitcache import LRUCache

    assert isinstance(asm._ASM_CACHE, LRUCache)
    c = LRUCache(maxsize=3)
    for i in range(10):
        c[i] = i * i
    assert len(c) == 3 and 9 in c and 0 not in c
    c.get(7)
    c[10] = 0  # evicts 8 (LRU), keeps recently-touched 7
    assert 7 in c and 8 not in c

    # eviction + re-assembly correctness on a real form
    mesh = MakeStructured2DMesh(quads=False, nx=4, ny=4)
    V = H1(mesh, order=1)
    u, v = V.TnT()
    a = BilinearForm(V)
    a += SymbolicBFI(form=u * v)
    a.Assemble()
    A1 = np.asarray(a.mat.todense())
    old = asm._ASM_CACHE
    try:
        asm._ASM_CACHE = LRUCache(maxsize=1)
        a.Assemble()
        # displace it, then re-assemble (recompiles transparently)
        f = LinearForm(V)
        f += SymbolicLFI(form=v)
        f.Assemble()
        a.Assemble()
        assert np.abs(np.asarray(a.mat.todense()) - A1).max() < 1e-14
    finally:
        asm._ASM_CACHE = old


def test_diamatrix_diagonal_requires_zero_offset():
    """DIAMatrix.diagonal() must return the TRUE main diagonal (not a
    searchsorted insertion point) and raise when offset 0 is absent
    (code-review regression)."""
    import numpy as np
    import jax.numpy as jnp
    import pytest

    from ngsxfem_tpu.solvers.sparse import DIAMatrix

    n = 5
    vals = jnp.asarray(np.arange(3 * n, dtype=np.float32).reshape(3, n))
    m = DIAMatrix(offsets=[-1, 0, 1], vals=vals)
    assert np.allclose(np.asarray(m.diagonal()), np.arange(n, 2 * n))
    m2 = DIAMatrix(offsets=[-1, 1], vals=vals[:2])
    with pytest.raises(ValueError):
        m2.diagonal()


def test_cgsolver_ell_fast_path_runs():
    """CGSolver's cached ELL fast path jits `tol` statically; a traced tol
    hit `if tol == 0:` inside cg and crashed with TracerBoolConversionError
    (code-review regression)."""
    import numpy as np
    import jax.numpy as jnp

    from ngsxfem_tpu.solvers.sparse import SparseMatrix
    from ngsxfem_tpu.solvers.krylov import CGSolver

    n = 30
    idx = np.arange(n)
    prev = np.roll(idx, 1)
    # SPD cyclic tridiagonal: 4 on the diagonal, -1 on both off-diagonals
    A = SparseMatrix(np.concatenate([idx, idx, prev]),
                     np.concatenate([idx, prev, idx]),
                     np.concatenate([np.full(n, 4.0), np.full(n, -1.0),
                                     np.full(n, -1.0)]),
                     shape=(n, n))
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)
    x = CGSolver(A, maxsteps=200, tol=1e-10) * b
    r = np.asarray(A.matvec(jnp.asarray(x))) - b
    assert np.linalg.norm(r) < 1e-6 * np.linalg.norm(b)


def test_levelset_zero_on_vertices_no_poison():
    """A level set vanishing EXACTLY on mesh vertices: eps_guard classifies
    those elements as cut on device, so the host capacity must count them
    the same way or the overflow NaN poison fires on valid geometry
    (code-review regression)."""
    import numpy as np

    from ngsxfem_tpu import (
        MakeStructured2DMesh, H1, GridFunction, InterpolateToP1, Integrate,
        NEG, x,
    )

    mesh = MakeStructured2DMesh(quads=False, nx=8, ny=8)
    lset = GridFunction(H1(mesh, order=1))
    InterpolateToP1(x - 0.5, lset)  # zero plane through the x=0.5 vertices
    # force exact zeros (InterpolateToP1 may eps-perturb)
    arr = np.array(lset.vec, copy=True)
    arr[np.abs(arr) < 1e-12] = 0.0
    lset.vec.data = arr
    val = Integrate(levelset_domain={"levelset": lset, "domain_type": NEG},
                    cf=1.0, mesh=mesh, order=2)
    assert np.isfinite(val), val
    assert abs(val - 0.5) < 1e-6, val


def test_two_tier_rejects_combined_domain_types():
    """HASNEG etc. must raise, not silently integrate the POS uncut tier
    (code-review regression)."""
    import pytest

    from ngsxfem_tpu import (
        MakeStructured2DMesh, H1, GridFunction, InterpolateToP1, Integrate, x,
    )
    from ngsxfem_tpu.domaintype import HASNEG

    mesh = MakeStructured2DMesh(quads=False, nx=4, ny=4)
    lset = GridFunction(H1(mesh, order=1))
    InterpolateToP1(x - 0.5, lset)
    with pytest.raises(ValueError):
        Integrate(levelset_domain={"levelset": lset, "domain_type": HASNEG},
                  cf=1.0, mesh=mesh, order=2)


def test_integrate_region_wise_default_mesh():
    """region_wise=True is now implemented (VERDICT r3 item 8): on a mesh
    with a single (default) material it returns a length-1 per-region array
    summing to the plain integral."""
    import numpy as np

    from ngsxfem_tpu import MakeStructured2DMesh, Integrate

    mesh = MakeStructured2DMesh(quads=False, nx=2, ny=2)
    vols = Integrate(cf=1.0, mesh=mesh, order=1, region_wise=True)
    assert np.asarray(vols).shape == (1,)
    assert abs(float(np.sum(np.asarray(vols))) - 1.0) < 1e-12


def test_integrate_region_wise_multi_material():
    """Multi-material region_wise: one entry per material in
    mesh.GetMaterials() order — including SPARSE material ids and a
    declared-but-empty material, which must yield a 0.0 entry instead of
    being dropped (advisor round-4 finding)."""
    import numpy as np

    from ngsxfem_tpu import MakeStructured2DMesh, Integrate, x

    mesh = MakeStructured2DMesh(quads=False, nx=4, ny=4)
    cent = mesh.vertices_np[mesh.elements_np].mean(axis=1)
    mesh.mat_of_el_np = np.where(cent[:, 0] < 0.5, 1, 3).astype(np.int32)
    mesh.mat_names = {1: "left", 3: "right", 5: "ghost"}
    assert mesh.GetMaterials() == ("left", "right", "ghost")

    vols = np.asarray(Integrate(cf=1.0, mesh=mesh, order=1,
                                region_wise=True))
    assert vols.shape == (3,)
    assert np.allclose(vols, [0.5, 0.5, 0.0], atol=1e-12)

    # asymmetric integrand pins the ORDER (left != right)
    mom = np.asarray(Integrate(cf=x, mesh=mesh, order=2, region_wise=True))
    assert np.allclose(mom, [0.125, 0.375, 0.0], atol=1e-12)

    # Materials() regex selection sees the declared-but-empty region too
    assert mesh.Materials("ghost").Mask().sum() == 0
    assert mesh.Materials("left|right").Mask().sum() == mesh.ne


def test_standalone_vec_setitem():
    """CreateVector() vectors accept slice assignment (NGSolve out-parameter
    convention used by P2TwoGridCL.Mult(rhs, usol))."""
    import numpy as np

    from ngsxfem_tpu import MakeStructured2DMesh, H1, GridFunction

    mesh = MakeStructured2DMesh(quads=False, nx=2, ny=2)
    gfu = GridFunction(H1(mesh, order=1))
    v = gfu.vec.CreateVector()
    v[:] = np.arange(gfu.space.ndof, dtype=np.float64)
    assert np.allclose(np.asarray(v), np.arange(gfu.space.ndof))


def test_grad_dispatch_non_spacetime_hook_spaces():
    """grad() on XFESpace/HDiv GridFunctions must not take the space-time
    branch (those spaces also define gf_eval_hook; code-review regression)."""
    import numpy as np

    from ngsxfem_tpu import (
        MakeStructured2DMesh, H1, GridFunction, CutInfo, XFESpace, HDiv,
        InterpolateToP1, Integrate, sqrt, x, y, NEG,
    )
    from ngsxfem_tpu.fem.gridfunction import grad

    mesh = MakeStructured2DMesh(quads=False, nx=6, ny=6,
                                mapping=lambda a, b: (2 * a - 1, 2 * b - 1))
    lset = GridFunction(H1(mesh, order=1))
    InterpolateToP1(sqrt(x * x + y * y) - 0.6, lset)
    ci = CutInfo(mesh, lset)
    gfx = GridFunction(XFESpace(H1(mesh, order=1), ci))
    g = grad(gfx)  # crashed with AttributeError: no 'spacefes'
    v = Integrate(levelset_domain={"levelset": lset, "domain_type": NEG},
                  cf=g[0] * g[0], mesh=mesh, order=2)
    assert np.isfinite(v)
    grad(GridFunction(HDiv(mesh, order=0)))  # must not raise


def test_component_vec_full_accessor_surface():
    """Component GridFunction .vec supports the NGSolve accessor surface
    (FV().NumPy(), __array__, indexing, CreateVector; code-review
    regression: everything but data/__setitem__ raised AttributeError)."""
    import numpy as np

    from ngsxfem_tpu import MakeStructured2DMesh, H1, GridFunction
    from ngsxfem_tpu.fem.space import CompoundFESpace

    mesh = MakeStructured2DMesh(quads=False, nx=2, ny=2)
    W = CompoundFESpace([H1(mesh, 1), H1(mesh, 1)])
    gfu = GridFunction(W)
    c0, c1 = gfu.components
    c1.vec[:] = 2.0
    assert np.allclose(c1.vec.FV().NumPy(), 2.0)
    assert np.allclose(np.asarray(c1.vec), 2.0)
    assert float(c1.vec[0]) == 2.0 and len(c1.vec) == W.components[1].ndof
    assert np.allclose(np.asarray(c0.vec), 0.0)  # sibling untouched
    v = c1.vec.CreateVector()
    assert len(np.asarray(v)) == len(c1.vec)
    # parent sees the write in its second block
    assert np.allclose(np.asarray(gfu.vec)[W.components[0].ndof:], 2.0)


def test_getdofs_skips_placeholder_zero():
    """GetDofsOfElements on Compressed/XFESpace must not mark dof 0 through
    the placeholder-0 el2dof slots of inactive dofs (code-review
    regression)."""
    import numpy as np

    from ngsxfem_tpu import (
        MakeStructured2DMesh, H1, GridFunction, InterpolateToP1, Compress, x,
    )
    from ngsxfem_tpu.fem.space import GetDofsOfElements, BitArray

    mesh = MakeStructured2DMesh(quads=False, nx=4, ny=4)
    V = H1(mesh, order=1)
    # active: dofs of elements in the right half only
    lset = GridFunction(V)
    InterpolateToP1(x - 0.45, lset)
    el_right = np.asarray(lset.vec)[V.el2dof_np].min(axis=1) > 0
    act = np.zeros(V.ndof, bool)
    act[V.el2dof_np[el_right].ravel()] = True
    Vc = Compress(V, BitArray(act))
    # mark one left-half element: ALL its dofs are inactive placeholders
    mask = np.zeros(mesh.ne, bool)
    mask[np.nonzero(~el_right)[0][0]] = True
    got = GetDofsOfElements(Vc, BitArray(mask)).np
    assert not got.any(), "placeholder-0 slots marked compressed dof 0"


def test_periodic_preserves_dg():
    """Periodic() merges only periodic-boundary partners, never co-located
    DG dofs (code-review regression: Periodic(L2) fused 24 dofs to 6)."""
    from ngsxfem_tpu import MakeStructured2DMesh, H1, Periodic
    from ngsxfem_tpu.fem.space import L2

    mesh = MakeStructured2DMesh(quads=False, nx=2, ny=2, periodic="x")
    assert Periodic(H1(mesh, order=1)).ndof == 6  # 3x3 lattice wraps to 2x3
    L = L2(mesh, order=1)
    assert Periodic(L).ndof == L.ndof  # DG structure intact
    V2 = H1(mesh, order=2)
    assert Periodic(V2).ndof == V2.ndof - 5  # 3 verts + 2 edge nodes on seam


def test_as_cdt_rejects_ambiguous_ints():
    import pytest

    from ngsxfem_tpu.domaintype import as_cdt, NEG, HASNEG, CDOM_NEG

    assert as_cdt(NEG) == CDOM_NEG
    assert as_cdt(HASNEG) == HASNEG
    assert as_cdt(5) == HASNEG  # >= 3: unambiguous CDT mask
    with pytest.raises(TypeError):
        as_cdt(0)
    with pytest.raises(TypeError):
        as_cdt(2)


def test_skeleton_and_eb_integrals_see_deformation():
    """Skeleton and element-boundary integrals honor SetDeformation AND the
    per-integral deformation override in their facet measure (code-review
    regression: both builders ignored the deformation entirely)."""
    from ngsxfem_tpu import SymbolicFacetPatchBFI  # noqa: F401 (API presence)

    mesh = MakeStructured2DMesh(quads=False, nx=2, ny=2)
    Vd = VectorH1(mesh, order=1)
    deform = GridFunction(Vd)
    deform.Set(CoefficientFunction((0.25 * x, 0.0 * y)))  # x -> 1.25 x

    V = H1(mesh, order=1, dgjumps=True)
    u, v = V.TnT()

    def total(skeleton, use_override):
        a = BilinearForm(V)
        kw = {"deformation": deform} if use_override else {}
        if skeleton:
            a += SymbolicBFI(form=u * v, skeleton=True, **kw)
        else:
            a += SymbolicBFI(form=u * v, element_boundary=True, **kw)
        if not use_override:
            mesh.SetDeformation(deform)
        try:
            a.Assemble()
        finally:
            if not use_override:
                mesh.UnsetDeformation()
        one = np.ones(V.ndof)
        return float(one @ np.asarray(a.mat.todense()) @ one)

    # exact deformed facet lengths from the mesh arrays
    verts = mesh.vertices_np.copy()
    verts[:, 0] *= 1.25
    fl = np.linalg.norm(verts[mesh.facets_np[:, 1]]
                        - verts[mesh.facets_np[:, 0]], axis=1)
    interior = mesh.facet2el_np[:, 1] >= 0
    exact_skel = fl[interior].sum()
    exact_eb = fl[interior].sum() * 2 + fl[~interior].sum()

    for use_override in (False, True):
        got_skel = total(True, use_override)
        got_eb = total(False, use_override)
        assert abs(got_skel - exact_skel) < 1e-12, (use_override, got_skel,
                                                    exact_skel)
        assert abs(got_eb - exact_eb) < 1e-12, (use_override, got_eb,
                                                exact_eb)


def test_eps_guard_reference_semantics():
    """The zero guard is ABSOLUTE and SIGN-COLLAPSING, exactly like the
    reference (straightcutrule.cpp:553-554): every |v| < 1e-14 becomes
    +1e-14, including tiny negatives.  A relative per-element threshold was
    tried (round 3) and measurably degraded the DG fictdom scheme: a facet
    lying ON the interface with endpoint values [0, -5.5e-17] was turned
    into a fully-NEG facet (O(1) spurious interior-penalty contribution,
    test_workloads::test_fictdom_dg_ghostpen caught the EOC loss), where
    the collapse classifies it deterministically as uncut-POS."""
    import numpy as np
    import jax.numpy as jnp
    from ngsxfem_tpu.ops.straightcut import eps_guard

    vals = jnp.asarray(np.array([[0.0, -5.5e-17, 3e-15],
                                 [-1.0, 2.0, -9.9e-15]]))
    out = np.asarray(eps_guard(vals))
    np.testing.assert_allclose(out[0], [1e-14, 1e-14, 1e-14])
    np.testing.assert_allclose(out[1], [-1.0, 2.0, 1e-14])
    # on-interface facet: both endpoints collapse positive -> no NEG part
    assert (out[0] > 0).all()


def test_quad_dir_policy_in_assembly_signature():
    """Two otherwise-identical cut BFIs differing only in quad_dir_policy
    must compile and assemble SEPARATELY: the policy changes the QUAD/HEX
    iterated-integral rule, and omitting it from the assembly cache key made
    the second form silently reuse whichever policy assembled first
    (order-dependent wrong numbers; found by review probe)."""
    import numpy as np
    from ngsxfem_tpu import (
        NEG, H1, BilinearForm, GridFunction, InterpolateToP1,
        MakeStructured2DMesh, SymbolicCutBFI, sqrt, x, y,
    )

    def assemble(policy):
        mesh = MakeStructured2DMesh(quads=True, nx=4, ny=4)
        lsetp1 = GridFunction(H1(mesh, order=1))
        InterpolateToP1(sqrt((x - 0.23) ** 2 + (y - 0.41) ** 2) - 0.33, lsetp1)
        V = H1(mesh, order=1)
        u, v = V.TnT()
        out = []
        for p in (policy, "FALLBACK" if policy == "FIRST" else "FIRST"):
            a = BilinearForm(V)
            a += SymbolicCutBFI(
                {"levelset": lsetp1, "domain_type": NEG,
                 "quad_dir_policy": p}, form=u * v)
            a.Assemble()
            out.append(np.asarray(a.mat.todense()))
        return out

    f1, fb1 = assemble("FIRST")     # FIRST compiled first
    fb2, f2 = assemble("FALLBACK")  # FALLBACK compiled first
    # each policy must give the same matrix regardless of compile order
    assert np.abs(f1 - f2).max() < 1e-14
    assert np.abs(fb1 - fb2).max() < 1e-14
    # and the two policies genuinely differ on this geometry (guards the
    # test itself against a future policy no-op)
    assert np.abs(f1 - fb1).max() > 1e-10
