"""Misc ports: single-element decomposition (test_localgeom analog),
force_intorder (test_num_nxfem analog), legacy-path guard (test_backuprule
deviation), VTK output."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from ngsxfem_tpu import (
    NEG, POS, IF, H1, CoefficientFunction, GridFunction, Integrate,
    InterpolateToP1, Make1DMesh, MakeStructured2DMesh, VTKOutput, x, y,
)
from ngsxfem_tpu.ops.straightcut import cut_rule_simplices
from ngsxfem_tpu.ops.cuttables import REF_VERTS


def test_single_trig_decomposition():
    """One cut reference triangle: sub-rule measures match analytics
    (cf. reference test_localgeom.py:24)."""
    coords = jnp.asarray(REF_VERTS["trig"])[None]
    vals = jnp.asarray([[-1.0, 1.0, 1.0]])  # cut at midpoints of both edges
    r = cut_rule_simplices(coords, vals, 2, 2)
    wneg = float(jnp.sum(r.w * (r.side == 0)))
    wpos = float(jnp.sum(r.w * (r.side == 1)))
    wif = float(jnp.sum(r.w_if))
    assert abs(wneg - 0.125) < 1e-14  # quarter of the triangle
    assert abs(wpos - 0.375) < 1e-14
    assert abs(wif - np.sqrt(2) / 2) < 1e-14  # segment (0.5,0)-(0,0.5)


@pytest.mark.parametrize("force", [2, 5, 9])
def test_force_intorder(force):
    """`force_intorder` in the levelset_domain dict overrides the order
    (cf. reference test_num_nxfem quadrature-order variants)."""
    mesh = Make1DMesh(1)
    g = GridFunction(H1(mesh, order=1))
    g.Set(0.6 - x)
    val = Integrate(
        {"levelset": g, "domain_type": NEG, "force_intorder": force},
        x**2, mesh, order=0,
    )
    exact = (1 - 0.6**3) / 3
    assert abs(val - exact) < 1e-13


def test_subdivlvl_accepted_negative_rejected():
    """subdivlvl>0 runs the uniform-subdivision engine (test_backuprule.py
    covers its accuracy); negative values raise."""
    mesh = Make1DMesh(2)
    g = GridFunction(H1(mesh, order=1))
    g.Set(0.5 - x)
    val = Integrate({"levelset": g, "domain_type": NEG, "subdivlvl": 2},
                    x, mesh, order=2)
    assert abs(val - 0.375) < 1e-12  # NEG = {x > 1/2}: int_{1/2}^1 x dx
    with pytest.raises(ValueError):
        Integrate({"levelset": g, "domain_type": NEG, "subdivlvl": -1},
                  x, mesh, order=2)


def test_vtk_output(tmp_path):
    mesh = MakeStructured2DMesh(quads=False, nx=3, ny=3)
    g = GridFunction(H1(mesh, order=1))
    g.Set(x * y)
    fn = VTKOutput(ma=mesh, coefs=[g], names=["u"],
                   filename=str(tmp_path / "o")).Do()
    assert os.path.getsize(fn) > 100


def test_raw_cf_levelset_falls_back_to_p1():
    """Raw-CF level sets route to InterpolateToP1 + straight cut with a
    warning (reference CF2GF shortcut, cutint/xintegration.cpp:91-103)."""
    import warnings
    import math
    from ngsxfem_tpu import (
        MakeStructured2DMesh, Integrate, CutInfo, NEG, sqrt, x, y,
        CoefficientFunction,
    )

    mesh = MakeStructured2DMesh(
        quads=False, nx=24, ny=24, mapping=lambda a, b: (2 * a - 1, 2 * b - 1))
    phi = sqrt(x * x + y * y) - 0.7  # raw CF, not a GridFunction
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        area = Integrate(levelset_domain={"levelset": phi, "domain_type": NEG},
                         cf=CoefficientFunction(1.0), mesh=mesh, order=2)
        assert any("P1" in str(wi.message) for wi in w)
    assert abs(area - math.pi * 0.49) < 5e-3

    ci = CutInfo(mesh, phi)  # CF accepted here too
    assert ci.GetElementsOfType(NEG).NumSet() > 0


def test_timers():
    """Timer/PrintTimers subsystem (NGSolve Timer analog, SURVEY §5)."""
    from ngsxfem_tpu.utils.timing import Timer, GetTimers, ResetTimers, region
    from ngsxfem_tpu import MakeStructured2DMesh, H1, BilinearForm, SymbolicBFI

    ResetTimers()
    mesh = MakeStructured2DMesh(quads=False, nx=4, ny=4)
    V = H1(mesh, order=1)
    u, v = V.TnT()
    a = BilinearForm(V)
    a += SymbolicBFI(form=u * v)
    with region("outer"):
        a.Assemble()
    t = GetTimers()
    assert "BilinearForm::Assemble" in t and t["BilinearForm::Assemble"][1] == 1
    assert "outer" in t
    assert t["outer"][0] >= t["BilinearForm::Assemble"][0]


def test_getdofsoffacets_element_spaces():
    """GetDofsOfFacets on element-based spaces returns the NT_FACET node
    dofs (reference xfem/cutinfo.cpp:306-329 via FESpace::GetDofNrs):
    facet-interior Lagrange dofs for H1, nothing for L2."""
    import numpy as np
    from ngsxfem_tpu import (MakeStructured2DMesh, H1, L2, FacetFESpace,
                             GetDofsOfFacets)

    mesh = MakeStructured2DMesh(quads=False, nx=4, ny=4)
    fmask = np.zeros(mesh.nfacets, bool)
    fmask[:3] = True
    assert GetDofsOfFacets(H1(mesh, order=1), fmask).NumSet() == 0
    assert GetDofsOfFacets(H1(mesh, order=2), fmask).NumSet() == 3
    assert GetDofsOfFacets(H1(mesh, order=3), fmask).NumSet() == 6
    assert GetDofsOfFacets(L2(mesh, order=2), fmask).NumSet() == 0
    assert GetDofsOfFacets(FacetFESpace(mesh, order=1), fmask).NumSet() == 6


def test_periodic_facet_algebra():
    """Periodic-aware facet set algebra (reference xfem/cutinfo.cpp:224-235:
    GetPeriodicFacet joins a boundary facet to its partner's element; only
    the lower-numbered facet of each pair is marked)."""
    import numpy as np
    from ngsxfem_tpu import (MakeStructured2DMesh, GetFacetsWithNeighborTypes,
                             GetElementsWithNeighborFacets)

    mesh = MakeStructured2DMesh(quads=False, nx=4, ny=4, periodic="x")
    pf = mesh.periodic_facet_np
    ids = np.nonzero(pf >= 0)[0]
    assert len(ids) == 8 and all(pf[pf[i]] == i for i in ids)

    cents = mesh.vertices_np[mesh.elements_np].mean(1)
    a = cents[:, 0] < 1 / 4
    b = cents[:, 0] > 3 / 4
    f = GetFacetsWithNeighborTypes(mesh, a=a, b=b,
                                   bnd_val_a=False, bnd_val_b=False)
    assert f.NumSet() == 4  # one per pair, lower-id side only
    assert GetElementsWithNeighborFacets(mesh, f).NumSet() == 8

    m2 = MakeStructured2DMesh(quads=False, nx=4, ny=4)  # non-periodic
    f2 = GetFacetsWithNeighborTypes(m2, a=a, b=b,
                                    bnd_val_a=False, bnd_val_b=False)
    assert f2.NumSet() == 0


def test_periodic_space_accuracy():
    """Periodic(space): dof identification across periodic boundaries gives
    an O(h^2) solution of -u'' + u = cos(2 pi x) with u periodic in x."""
    import numpy as np
    from ngsxfem_tpu import (MakeStructured2DMesh, H1, Periodic, BilinearForm,
                             LinearForm, SymbolicBFI, SymbolicLFI, grad,
                             GridFunction, Integrate, CoefficientFunction,
                             cos, x)

    errs = []
    for nx in (8, 16):
        mesh = MakeStructured2DMesh(quads=False, nx=nx, ny=nx, periodic="x")
        P = Periodic(H1(mesh, order=1))
        assert P.ndof == (nx + 1) ** 2 - (nx + 1)
        u, v = P.TnT()
        a = BilinearForm(P)
        a += SymbolicBFI(form=grad(u) * grad(v) + u * v)
        f = LinearForm(P)
        f += SymbolicLFI(form=cos(2 * np.pi * x) * v)
        a.Assemble()
        f.Assemble()
        gfu = GridFunction(P)
        gfu.vec.data = a.mat.Inverse() * f.vec.data
        exact = cos(2 * np.pi * x) / (1 + 4 * np.pi ** 2)
        err = Integrate(cf=(gfu - exact) ** 2, mesh=mesh, order=6) ** 0.5
        errs.append(float(err))
    assert errs[1] < errs[0] / 3.2, errs


def test_element_boundary_integrals_exact():
    """element_boundary=True (reference T_CalcElementMatrixEBAdd,
    xfem/symboliccutbfi.cpp:319,491-678): P0 element-boundary mass diagonal
    equals each element's (cut) boundary measure, exactly."""
    import numpy as np
    from ngsxfem_tpu import (MakeStructured2DMesh, L2, H1, BilinearForm,
                             SymbolicBFI, GridFunction, InterpolateToP1,
                             NEG, x)

    mesh = MakeStructured2DMesh(quads=False, nx=1, ny=1)
    V = L2(mesh, order=0)
    u, v = V.TnT()

    a = BilinearForm(V)
    a += SymbolicBFI(form=u * v, element_boundary=True)
    a.Assemble()
    diag = np.asarray(a.mat.ell().vals).ravel()[:2]
    assert np.allclose(diag, 2 + np.sqrt(2), atol=1e-12)  # perimeter

    l = GridFunction(H1(mesh, order=1))
    InterpolateToP1(x - 0.5, l)
    a2 = BilinearForm(V)
    a2 += SymbolicBFI({"levelset": l, "domain_type": NEG}, form=u * v,
                      element_boundary=True)
    a2.Assemble()
    d2 = np.asarray(a2.mat.ell().vals).ravel()[:2]
    # NEG part of each triangle's boundary: T1 bottom 0.5 + hyp 0.5*sqrt(2);
    # T2 left 1 + top 0.5 + hyp 0.5*sqrt(2)
    assert np.allclose(d2, [0.5 + np.sqrt(2) / 2, 1.5 + np.sqrt(2) / 2],
                       atol=1e-12)


def test_codim2_if_on_element_boundary():
    """Unfitted codim-2 integrals (reference xfem/symboliccutbfi.cpp:732,
    898-946, 'experimental'): levelset IF with element_boundary=True gives
    crossing-point (2D) / facet-segment (3D) rules, one per adjacent
    element."""
    import numpy as np
    from ngsxfem_tpu import (MakeStructured2DMesh, MakeStructured3DMesh, L2,
                             H1, BilinearForm, SymbolicBFI, GridFunction,
                             InterpolateToP1, IF, x, y, z)

    # 2D: vertical line x=0.4 on a 4x4 trig mesh: 5 horizontal-line crossings
    # (3 interior facets counted twice + 2 boundary once = 8) + 4 diagonal
    # crossings counted twice = 8 -> total weight 16
    mesh = MakeStructured2DMesh(quads=False, nx=4, ny=4)
    l = GridFunction(H1(mesh, order=1))
    InterpolateToP1(x - 0.4, l)
    V = L2(mesh, order=0)
    u, v = V.TnT()
    a = BilinearForm(V)
    a += SymbolicBFI({"levelset": l, "domain_type": IF}, form=u * v,
                     element_boundary=True)
    a.Assemble()
    tot = float(np.asarray(a.mat.ell().vals).sum())
    assert abs(tot - 16.0) < 1e-12, tot

    # 3D: plane x=0.4 on a 2x2x2 Kuhn-tet mesh; expected total = sum over
    # facet triangles of |plane cap triangle| x (#adjacent elements),
    # computed independently by clipping each facet against the plane
    m3 = MakeStructured3DMesh(hexes=False, nx=2, ny=2, nz=2)
    l3 = GridFunction(H1(m3, order=1))
    InterpolateToP1(x - 0.4, l3)
    V3 = L2(m3, order=0)
    u3, v3 = V3.TnT()
    a3 = BilinearForm(V3)
    a3 += SymbolicBFI({"levelset": l3, "domain_type": IF}, form=u3 * v3,
                      element_boundary=True)
    a3.Assemble()
    tot3 = float(np.asarray(a3.mat.ell().vals).sum())

    verts = m3.vertices_np
    expected = 0.0
    for f in range(m3.nfacets):
        tri = verts[m3.facets_np[f]]
        phi = tri[:, 0] - 0.4
        pts = []
        for i in range(3):
            j = (i + 1) % 3
            if phi[i] * phi[j] < 0:
                t = phi[i] / (phi[i] - phi[j])
                pts.append(tri[i] + t * (tri[j] - tri[i]))
        if len(pts) == 2:
            seg = np.linalg.norm(pts[1] - pts[0])
            nadj = 2 if m3.facet2el_np[f, 1] >= 0 else 1
            expected += seg * nadj
    assert abs(tot3 - expected) < 1e-10, (tot3, expected)


def test_codim2_if_on_skeleton_and_boundary():
    """Codim-2 IF rules on interior skeleton facets (counted once per facet)
    and on domain-boundary facets."""
    import jax.numpy as jnp
    from ngsxfem_tpu import (MakeStructured2DMesh, H1, GridFunction,
                             InterpolateToP1, IF, x)
    from ngsxfem_tpu.cf.coefficient import wrap
    from ngsxfem_tpu.forms.assemble import (Integral, _skeleton_ctx,
                                            _boundary_ctx, BND)

    mesh = MakeStructured2DMesh(quads=False, nx=4, ny=4)
    l = GridFunction(H1(mesh, order=1))
    InterpolateToP1(x - 0.4, l)
    ld = {"levelset": l, "domain_type": IF}

    integ = Integral(form=wrap(1.0), levelset_domain=ld, skeleton=True)
    ctx, e1, e2, w, mask = _skeleton_ctx(integ, mesh, 2)
    # x=0.4 crosses 3 interior horizontal facets + 4 diagonals
    assert abs(float(jnp.sum(jnp.where(mask, w, 0.0))) - 7.0) < 1e-12

    integ_b = Integral(form=wrap(1.0), levelset_domain=ld, vb=BND)
    ctx, re_, w, mask = _boundary_ctx(integ_b, mesh, 2)
    # crosses bottom and top boundary once each
    assert abs(float(jnp.sum(jnp.where(mask, w, 0.0))) - 2.0) < 1e-12


def test_differentiable_through_levelset():
    """BASELINE north star: the pipeline is differentiable through the level
    set.  jax.grad of the NEG-domain area wrt the circle radius matches the
    analytic shape derivative 2*pi*r to O(h^2), and Newton on area(r) hits a
    target area to machine precision."""
    import numpy as np
    import jax

    from examples.levelset_shape_opt import make_area_fn, run

    area = make_area_fn(nx=32)
    r0 = 0.31
    g = float(jax.grad(area)(r0))
    assert abs(g - 2 * np.pi * r0) < 0.02, g

    r, final = run(nx=32, target_area=0.25, verbose=False)
    assert abs(final - 0.25) < 1e-10
    assert abs(r - np.sqrt(0.25 / np.pi)) < 2e-3

    # 3D: dV/dr of a ball matches the surface area 4*pi*r^2 to O(h^2)
    import jax.numpy as jnp
    from ngsxfem_tpu.ops.straightcut import cut_rule_element, eps_guard
    from ngsxfem_tpu.mesh.mesh import map_points, det_and_inv
    from ngsxfem_tpu.mesh.structured import MakeStructured3DMesh

    m3 = MakeStructured3DMesh(hexes=False, nx=12, ny=12, nz=12)
    c3 = jnp.asarray(m3.vertices_np[m3.elements_np])
    vd3 = jnp.asarray(np.sqrt(((m3.vertices_np - 0.5) ** 2).sum(1)))

    def vol(r):
        vals = eps_guard((vd3 - r)[m3.elements_np])
        rule = cut_rule_element("tet", vals, 2)
        _, J = map_points("tet", c3, rule.pts)
        detJ, _ = det_and_inv(J)
        return jnp.sum(rule.w * (rule.side == 0) * jnp.abs(detJ))

    dv = float(jax.grad(vol)(0.31))
    assert abs(dv - 4 * np.pi * 0.31 ** 2) < 0.03, dv

    # through the SOLVE: compliance sensitivity vs central finite differences
    from examples.levelset_shape_opt import compliance_sensitivity

    comp = compliance_sensitivity(nx=10)
    r0 = 0.33
    dc = float(jax.grad(comp)(r0))
    eps = 1e-5
    fd = (float(comp(r0 + eps)) - float(comp(r0 - eps))) / (2 * eps)
    assert abs(dc - fd) < 1e-7 * max(abs(fd), 1e-30), (dc, fd)


def test_vtk_subdivision_steps_and_matrix(tmp_path):
    """VTKOutput honors subdivision, writes per-step files + a .pvd index,
    and handles matrix-valued CFs (review regressions)."""
    import numpy as np
    from ngsxfem_tpu import (
        MakeStructured2DMesh, VectorH1, GridFunction, VTKOutput,
        CoefficientFunction, grad, x, y,
    )

    mesh = MakeStructured2DMesh(quads=False, nx=2, ny=2)
    gf = GridFunction(VectorH1(mesh, order=1))
    gf.Set(CoefficientFunction((x * y, x - y)))
    base = str(tmp_path / "out")
    vtk = VTKOutput(mesh, coefs=[x, gf, grad(gf)],
                    names=["s", "v", "J"], filename=base, subdivision=2)
    f0 = vtk.Do(time=0.0)
    f1 = vtk.Do(time=0.5)
    assert f0.endswith("out.vtk") and "step0001" in f1
    txt0 = open(f0).read()
    # subdivision=2 on trigs: 16 sub-cells per element
    assert f"CELL_TYPES {mesh.ne * 16}" in txt0
    assert "FIELD J_field" in txt0  # matrix CF written as FIELD data
    pvd = open(base + ".pvd").read()
    assert 'timestep="0.5"' in pvd and "step0001" in pvd
