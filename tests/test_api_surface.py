"""Smoke coverage for exported API names not exercised elsewhere.

Every public name in ``ngsxfem_tpu`` that neither the test suite nor the
example workloads touch gets at least one behavioral check here — latent
crash bugs in rarely-used exported paths (like the CGSolver ELL tracer-bool
crash) must not survive only because nothing imports the name.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngsxfem_tpu import (  # noqa: E402
    MakeStructured2DMesh, H1, GridFunction, InterpolateToP1, Integrate,
    CoefficientFunction, x, y, NEG, POS, IF,
)


def _p1_circle(mesh, r=0.6):
    from ngsxfem_tpu import sqrt

    lset = GridFunction(H1(mesh, order=1))
    InterpolateToP1(sqrt(x * x + y * y) - r, lset)
    return lset


def _mesh11(nx=8):
    return MakeStructured2DMesh(quads=False, nx=nx, ny=nx,
                                mapping=lambda a, b: (2 * a - 1, 2 * b - 1))


def test_math_cf_zoo():
    """sin/tan/atan/exp/sinh/cosh/fabs/floor/ceil as CoefficientFunctions:
    integrals over the unit square match closed forms."""
    from ngsxfem_tpu import sin, tan, atan, exp, sinh, cosh, fabs, floor, ceil

    mesh = MakeStructured2DMesh(quads=False, nx=8, ny=8)
    cases = [
        (sin(x), 1 - np.cos(1.0)),
        (exp(x), np.e - 1.0),
        (sinh(x), np.cosh(1.0) - 1.0),
        (cosh(x), np.sinh(1.0)),
        (tan(0.5 * x), -2 * np.log(np.cos(0.5))),
        (fabs(x - 0.5), 0.25),
        (floor(x + 2.0), 2.0),          # floor = 2 a.e. on (0,1)
        (ceil(x - 2.0), -1.0),          # ceil = -1 a.e. on (0,1)
        (atan(CoefficientFunction(1.0)), np.pi / 4),
    ]
    for cf, exact in cases:
        val = Integrate(cf=cf, mesh=mesh, order=9)
        assert abs(val - exact) < 5e-5, (val, exact)


def test_domain_type_algebra():
    from ngsxfem_tpu import (
        DOMAIN_TYPE, COMBINED_DOMAIN_TYPE, TO_CDT, INVERT, ANY, UNCUT,
        CDOM_NEG, CDOM_POS, HASNEG, HASPOS, all_domain_types,
        all_combined_domain_types,
    )

    assert list(all_domain_types) == [NEG, POS, IF]
    assert len(all_combined_domain_types) == 8
    assert TO_CDT(NEG) == CDOM_NEG and TO_CDT(POS) == CDOM_POS
    assert int(TO_CDT(IF)) == 4
    # INVERT swaps the NEG/POS bits, IF bit unchanged (ngsxstd.hpp)
    assert INVERT(CDOM_NEG) == CDOM_POS
    assert INVERT(HASNEG) == HASPOS
    assert INVERT(ANY) == ANY and INVERT(UNCUT) == UNCUT
    assert DOMAIN_TYPE(0) is NEG and COMBINED_DOMAIN_TYPE(7) is ANY


def test_create_cut_integration_rule_direct():
    """CreateCutIntegrationRule (= cut_rule_element): NEG weights of the
    reference triangle with vertex values (-1, 1, 1) sum to the exact
    sub-triangle area 1/8."""
    import jax.numpy as jnp

    from ngsxfem_tpu import CreateCutIntegrationRule

    vals = jnp.asarray([[-1.0, 1.0, 1.0]])
    rule = CreateCutIntegrationRule("trig", vals, 2, "OPTIMAL")
    w_neg = np.asarray(rule.w * (rule.side == int(NEG))).sum()
    w_pos = np.asarray(rule.w * (rule.side == int(POS))).sum()
    assert abs(w_neg - 0.125) < 1e-12, w_neg
    assert abs(w_pos - 0.375) < 1e-12, w_pos


def test_integratex_compat_alias():
    from ngsxfem_tpu import IntegrateX

    mesh = _mesh11()
    lset = _p1_circle(mesh)
    a = IntegrateX(lset=lset, mesh=mesh, cf=1.0, order=3, domain_type=NEG)
    b = Integrate(levelset_domain={"levelset": lset, "domain_type": NEG},
                  cf=1.0, mesh=mesh, order=3)
    assert abs(a - b) < 1e-14


def test_levelset_zoo_and_bounding_boxes():
    from ngsxfem_tpu.utils.utils import BoundingBoxes, LevelsetExamples

    assert set(BoundingBoxes) >= {"sphere", "torus", "circle", "cheese"}
    # every 3D box is [xmin ymin zmin xmax ymax zmax] with min < max
    for name, box in BoundingBoxes.items():
        lo, hi = box[: len(box) // 2], box[len(box) // 2:]
        assert all(a < b for a, b in zip(lo, hi)), name
    # a zoo entry evaluates: circle level set at the origin is negative
    mesh = _mesh11()
    circ = LevelsetExamples["circle"] if "circle" in LevelsetExamples else None
    if circ is not None:
        gf = GridFunction(H1(mesh, order=1))
        InterpolateToP1(circ, gf)
        assert np.asarray(gf.vec).min() < 0 < np.asarray(gf.vec).max()


def test_statistic_container_and_convergence_table(capsys):
    from ngsxfem_tpu import StatisticContainer, PrintConvergenceTable

    sc = StatisticContainer()
    for e in (1e-1, 2.5e-2, 6.25e-3):
        sc.Add("l2", e)
    assert sc["l2"][0] == pytest.approx(0.1)
    PrintConvergenceTable(sc["l2"], label="l2")
    out = capsys.readouterr().out
    assert "2.0" in out  # EOC of the factor-4 sequence


def test_is_cut_and_draw():
    from ngsxfem_tpu import IsCut, Draw

    mesh = _mesh11()
    lset = _p1_circle(mesh)
    gf = IsCut(mesh, lset)
    vals = np.asarray(gf.vec)
    assert set(np.unique(vals)) <= {0.0, 1.0}
    assert 0 < vals.sum() < mesh.ne
    Draw(gf)  # documented no-op, must not raise


def test_spacetime_compat_names():
    from ngsxfem_tpu import (
        ReferenceTimeVariable, TimeVariableCoefficientFunction,
        SpaceTimeFESpace, ScalarTimeFE, dt_vec, CreateTimeRestrictedGF,
        SpaceTimeWeakSet, SpaceTimeInterpolateToP1, tref,
    )

    assert isinstance(tref, TimeVariableCoefficientFunction)
    assert type(ReferenceTimeVariable()) is type(tref)

    mesh = MakeStructured2DMesh(quads=False, nx=3, ny=3)
    st = SpaceTimeFESpace(H1(mesh, order=1), ScalarTimeFE(1))
    gf = GridFunction(st)
    SpaceTimeInterpolateToP1(x + tref, tref, gf)  # u(x, t) = x + t
    # trace at t=0 is x, at t=1 is x+1
    g0 = CreateTimeRestrictedGF(gf, 0.0)
    g1 = CreateTimeRestrictedGF(gf, 1.0)
    d = np.asarray(g1.vec) - np.asarray(g0.vec)
    assert np.allclose(d, 1.0, atol=1e-12)
    # dt_vec is the vector-valued time derivative proxy hook: on a plain
    # space-time GF expression dt of (x + t) integrates to the slab measure
    u, v = st.TnT()
    _ = dt_vec  # exported callable (proxy op; full use in assemble tests)
    # SpaceTimeWeakSet writes the bottom-node spatial component
    gs = GridFunction(H1(mesh, order=1))
    gs.Set(2.0 + 0 * x)
    SpaceTimeWeakSet(gf, gs, H1(mesh, order=1))
    assert np.allclose(np.asarray(gf.vec)[: gs.space.ndof],
                       np.asarray(gs.vec), atol=1e-12)


def test_vector_l2_mass():
    from ngsxfem_tpu import VectorL2, BilinearForm, SymbolicBFI

    mesh = MakeStructured2DMesh(quads=False, nx=3, ny=3)
    V = VectorL2(mesh, order=1)
    u, v = V.TnT()
    a = BilinearForm(V)
    a += SymbolicBFI(form=u * v)
    a.Assemble()
    D = np.asarray(a.mat.todense())
    # vector L2 mass matrix: SPD block-diagonal, trace = dim * |Omega| *
    # (mass trace of scalar basis) > 0
    assert np.allclose(D, D.T, atol=1e-12)
    assert np.linalg.eigvalsh(D).min() > 0


def test_fespace_factory_compound():
    from ngsxfem_tpu import FESpaceFactory

    mesh = MakeStructured2DMesh(quads=False, nx=3, ny=3)
    V = H1(mesh, order=1)
    W = FESpaceFactory([V, V])
    assert W.ndof == 2 * V.ndof
    with pytest.raises(TypeError):
        FESpaceFactory("h1ho")


def test_extend_ops_on_xfespace():
    """extend / extend_grad proxy hooks assemble (XFESpace enrichment)."""
    from ngsxfem_tpu import (
        XFESpace, CutInfo, BilinearForm, SymbolicBFI, extend, extend_grad,
        neg, grad,
    )

    mesh = _mesh11()
    lset = _p1_circle(mesh)
    ci = CutInfo(mesh, lset)
    Vh = H1(mesh, order=1)
    Xh = XFESpace(Vh, ci)
    u, v = Xh.TnT()
    ld = {"levelset": lset, "domain_type": NEG}
    a = BilinearForm(Xh)
    a += SymbolicBFI(ld, form=extend(u) * extend(v)
                     + extend_grad(u) * extend_grad(v))
    a.Assemble()
    D = np.asarray(a.mat.todense())
    assert np.isfinite(D).all() and abs(D).max() > 0
    # neg() restriction differs from extend() on the positive side
    b = BilinearForm(Xh)
    b += SymbolicBFI({"levelset": lset, "domain_type": POS},
                     form=neg(u) * neg(v))
    b.Assemble()


def test_quad_dir_policies_integrate():
    """FIRST / FALLBACK / OPTIMAL quad-direction policies all integrate a
    quad-mesh cut domain to the same value (different rule constructions)."""
    from ngsxfem_tpu import FIRST, FALLBACK, OPTIMAL, sqrt

    mesh = MakeStructured2DMesh(quads=True, nx=8, ny=8,
                                mapping=lambda a, b: (2 * a - 1, 2 * b - 1))
    lset = GridFunction(H1(mesh, order=1))
    InterpolateToP1(sqrt(x * x + y * y) - 0.6, lset)
    vals = []
    for pol in (FIRST, FALLBACK, OPTIMAL):
        vals.append(Integrate(
            levelset_domain={"levelset": lset, "domain_type": NEG,
                             "quad_dir_policy": pol},
            cf=1.0, mesh=mesh, order=4))
    assert abs(vals[0] - vals[2]) < 1e-8, vals
    assert abs(vals[1] - vals[2]) < 1e-3, vals  # fan fallback, lower order
    # P1 geometry error at h=0.25 dominates; exactness is covered by the
    # straightcutrule suite — this is an API/policy smoke check
    assert abs(vals[2] - np.pi * 0.36) < 5e-2, vals


def test_p2_prolongation_classes():
    from ngsxfem_tpu import P2Prolongation, P2CutProlongation

    m1 = MakeStructured2DMesh(quads=False, nx=2, ny=2)
    m2 = MakeStructured2DMesh(quads=False, nx=4, ny=4)
    for cls in (P2Prolongation, P2CutProlongation):
        prol = cls(m1)
        prol.Update(H1(m1, order=2))
        prol.Update(H1(m2, order=2))
        # prolongation of the constant is the constant (P2 partition of unity)
        c = np.ones(H1(m1, order=2).ndof)
        f = np.asarray(prol.Prolongate(1, c))
        assert np.allclose(f, 1.0, atol=1e-10)


def test_linear_mg_iterator_solves():
    """LinearMGIterator (reference cutmg.py:115+): MG-preconditioned CG
    driver over a 2-level cut hierarchy."""
    import jax.numpy as jnp

    from examples.cutmg import build_level
    from ngsxfem_tpu import LinearMGIterator, MultiGridCL
    from ngsxfem_tpu.solvers.mg import CutFemSmoother, prolongation_matrix

    meshes = [_mesh11(4), _mesh11(8)]
    levels = [build_level(m, 1) for m in meshes]
    spaces = [l[0] for l in levels]
    mats = [l[1] for l in levels]
    prols = [prolongation_matrix(spaces[0], spaces[1])]
    smoothers = [None, CutFemSmoother(mats[1], freedofs=levels[1][3],
                                      if_dofs=levels[1][4])]
    mg = MultiGridCL(mats, prols, smoothers, coarse_freedofs=levels[0][3])
    it = LinearMGIterator(mg, mats[1], freedofs=levels[1][3], maxit=60,
                          tol=1e-8)
    b = np.asarray(levels[1][2])
    xs = it * b
    fm = np.asarray(levels[1][3].np)
    r = (np.asarray(mats[1].matvec(jnp.asarray(xs))) - b)[fm]
    assert np.linalg.norm(r) <= 1e-7 * max(np.linalg.norm(b[fm]), 1e-30)


def test_mesh_class_direct():
    from ngsxfem_tpu import Mesh

    verts = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    els = np.array([[0, 1, 2], [1, 3, 2]], dtype=np.int32)
    m = Mesh("trig", verts, els)
    assert m.ne == 2 and m.nv == 4 and m.dim == 2
    assert abs(Integrate(cf=1.0, mesh=m, order=1) - 1.0) < 1e-14


def test_set_default_dtype_roundtrip():
    import jax.numpy as jnp

    from ngsxfem_tpu import set_default_dtype
    from ngsxfem_tpu.config import config

    orig = config.dtype
    try:
        set_default_dtype(jnp.float32)
        assert config.dtype == jnp.float32
    finally:
        set_default_dtype(orig)
    assert config.dtype == orig


def test_xfespace_dof_introspection():
    """BaseDofOfXDof / GetDomainOfDof / GetDomainNrs (reference
    python_xfem.cpp:411-444): every x-dof maps to an active base dof whose
    level-set side is OPPOSITE the enrichment domain, and GetDomainNrs
    lists exactly the element's x-dof domains (empty on uncut elements)."""
    from ngsxfem_tpu import XFESpace, CutInfo

    mesh = _mesh11()
    lset = _p1_circle(mesh)
    ci = CutInfo(mesh, lset)
    base = H1(mesh, order=1)
    xfes = XFESpace(base, ci)
    assert xfes.ndof > 0
    phi = np.asarray(lset.vec)
    for i in range(xfes.ndof):
        b = xfes.BaseDofOfXDof(i)
        assert 0 <= b < base.ndof
        dom = xfes.GetDomainOfDof(i)
        # node in NEG (phi<0) enriches POS and vice versa
        assert dom == (POS if phi[b] < 0 else NEG)
    cutmask = ci.GetElementsOfType(IF).np
    cut_el = int(np.nonzero(cutmask)[0][0])
    uncut_el = int(np.nonzero(~cutmask)[0][0])
    doms = xfes.GetDomainNrs(cut_el)
    assert len(doms) > 0 and all(d in (NEG, POS) for d in doms)
    # cross-check against the per-dof query through the element dof map
    xdofs = xfes.el2dof_np[cut_el][xfes.el2dof_valid_np[cut_el]]
    assert doms == [xfes.GetDomainOfDof(int(j)) for j in xdofs]
    assert xfes.GetDomainNrs(uncut_el) == []


def test_tref_fix_unfix():
    """FixTime/UnfixTime/IsFixed on the time variable CF (reference
    spacetime/timecf.cpp:26-32): a fixed tref integrates to its value
    without any time context; unfixing restores the error."""
    from ngsxfem_tpu import ReferenceTimeVariable

    tr = ReferenceTimeVariable()
    mesh = MakeStructured2DMesh(quads=False, nx=2, ny=2)
    assert not tr.IsFixed()
    with pytest.raises(ValueError):
        Integrate(tr, mesh, order=1)
    tr.FixTime(0.25)
    assert tr.IsFixed()
    assert Integrate(tr, mesh, order=1) == pytest.approx(0.25, rel=1e-6)
    tr.FixTime(0.75)  # re-fix must not reuse the 0.25-baked program
    assert Integrate(tr, mesh, order=1) == pytest.approx(0.75, rel=1e-6)
    tr.UnfixTime()
    assert not tr.IsFixed()
    with pytest.raises(ValueError):
        Integrate(tr, mesh, order=1)


def test_statistic_container_print(capsys):
    from ngsxfem_tpu import StatisticContainer

    sc = StatisticContainer()
    for e in (1e-1, 2.5e-2):
        sc.Add("L2", e)
        sc.Add("max", 2 * e)
    sc.Print(label="geom", select="L2")
    out = capsys.readouterr().out
    assert "geom_L2" in out and "2.0" in out
    sc.Print(label="geom", select="all")  # missing L1/misc series are skipped
    out = capsys.readouterr().out
    assert "geom_L2" in out and "geom_max" in out and "geom_L1" not in out
