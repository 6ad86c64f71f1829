"""Unstructured-mesh ingestion + full-pipeline proof (VERDICT r2 item 5).

The reference runs every tutorial on arbitrary Netgen meshes
(py_tutorials/nxfem.py:24-27); here the same pipeline is exercised on
(a) randomly perturbed (non-axis-aligned) simplicial meshes imported via
MeshFromArrays, (b) genuinely unstructured scipy-Delaunay meshes, and
(c) a Gmsh v2.2 round trip — exactness, EOC, and the Nitsche interface
solve (the acceptance triad of SURVEY.md §4).
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from ngsxfem_tpu import (
    NEG, POS, IF, H1, GridFunction, InterpolateToP1, Integrate,
    MakeStructured2DMesh, MakeStructured3DMesh, MeshFromArrays,
    MakeUnstructuredMesh, ReadGmsh, WriteGmsh, x, y, z, sqrt,
    CutInfo, HASNEG,
)


def _perturbed(dim, nx, amp=0.25, seed=3):
    """Structured simplicial mesh with randomly shifted interior vertices:
    every element is distorted and non-axis-aligned, boundary preserved."""
    if dim == 2:
        m = MakeStructured2DMesh(quads=False, nx=nx, ny=nx)
    else:
        m = MakeStructured3DMesh(hexes=False, nx=nx, ny=nx, nz=nx)
    V = m.vertices_np.copy()
    rng = np.random.default_rng(seed)
    h = 1.0 / nx
    interior = np.all((V > 1e-12) & (V < 1 - 1e-12), axis=1)
    V[interior] += rng.uniform(-amp * h, amp * h, size=V[interior].shape)
    mm = MeshFromArrays(m.et, V, m.elements_np)
    mm.bc_of_facet_np = m.bc_of_facet_np  # same topology -> same ids
    return mm


def _p1(mesh, cf):
    gf = GridFunction(H1(mesh, order=1))
    InterpolateToP1(cf, gf)
    return gf


@pytest.mark.parametrize("dim", [2, 3])
def test_perturbed_linear_lset_exact(dim):
    """Linear level set on a distorted mesh: P1 interpolation is exact, so
    NEG measure and interface measure are exact to roundoff."""
    mesh = _perturbed(dim, 8)
    lset = _p1(mesh, x - 0.5)
    ld = lambda dt: {"levelset": lset, "domain_type": dt}
    vol = Integrate(ld(NEG), cf=1.0, mesh=mesh, order=2)
    ifm = Integrate(ld(IF), cf=1.0, mesh=mesh, order=2)
    assert abs(vol - 0.5) < 1e-11
    assert abs(ifm - 1.0) < 1e-9  # distorted-tet IF polygon roundoff


def test_perturbed_circle_eoc():
    """Geometry EOC battery on perturbed meshes: mean EOC > 1.6 (the
    reference asserts > 1.75 on uniform meshes, test_straightcutrule.py:61)."""
    errs = []
    for nx in (8, 16, 32, 64):
        mesh = _perturbed(2, nx)
        lset = _p1(mesh, sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2) - 0.3)
        a = Integrate({"levelset": lset, "domain_type": NEG}, cf=1.0,
                      mesh=mesh, order=2)
        errs.append(abs(a - np.pi * 0.09))
    eocs = [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    assert np.mean(eocs) > 1.6, (errs, eocs)


def test_delaunay_unstructured_2d():
    """Genuinely unstructured Delaunay mesh: covers the unit square exactly;
    linear level set measures exact; circle area to discretization accuracy."""
    mesh = MakeUnstructuredMesh(dim=2, npts=400, seed=1)
    vol = Integrate(cf=1.0, mesh=mesh, order=1)
    assert abs(vol - 1.0) < 1e-12  # Delaunay of a convex hull tiles it

    lset = _p1(mesh, x - 0.5)
    a = Integrate({"levelset": lset, "domain_type": NEG}, cf=1.0,
                  mesh=mesh, order=2)
    assert abs(a - 0.5) < 1e-12

    lsc = _p1(mesh, sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2) - 0.3)
    ac = Integrate({"levelset": lsc, "domain_type": NEG}, cf=1.0,
                   mesh=mesh, order=2)
    assert abs(ac - np.pi * 0.09) < 4e-3


def test_delaunay_unstructured_3d():
    mesh = MakeUnstructuredMesh(dim=3, npts=300, seed=2)
    vol = Integrate(cf=1.0, mesh=mesh, order=1)
    assert abs(vol - 1.0) < 1e-12
    lset = _p1(mesh, x + y - 1.0)
    a = Integrate({"levelset": lset, "domain_type": NEG}, cf=1.0,
                  mesh=mesh, order=2)
    assert abs(a - 0.5) < 1e-12


def test_nxfem_solve_unstructured():
    """The Nitsche interface Poisson E2E solve on a genuinely unstructured
    Delaunay mesh meets the reference order-1 threshold
    (tests/pytests/test_nxfem.py:126: L2 < 0.06 at maxh 0.2)."""
    from examples import cutfem

    mesh = MakeUnstructuredMesh(
        dim=2, npts=900, seed=5,
        mapping=lambda a, b: (3 * a - 1.5, 3 * b - 1.5))
    err = cutfem.run(order=1, verbose=False, mesh=mesh)
    assert err < 0.06, err


def test_nxfem_solve_perturbed_3d():
    """Full fictdom pipeline (assembly incl. ghost penalty + solve) on a
    perturbed 3D tet mesh: runs, converges, positive solution."""
    from ngsxfem_tpu import (
        BilinearForm, LinearForm, SymbolicBFI, SymbolicLFI,
        SymbolicFacetPatchBFI, GetFacetsWithNeighborTypes, grad, specialcf,
        Norm, GetDofsOfElements,
    )

    mesh = _perturbed(3, 6)
    lsetp1 = _p1(mesh, sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2
                            + (z - 0.5) ** 2) - 0.3)
    ci = CutInfo(mesh, lsetp1)
    hasneg = ci.GetElementsOfType(HASNEG)
    hasif = ci.GetElementsOfType(IF)
    V = H1(mesh, order=1, dgjumps=True)
    u, v = V.TnT()
    h = specialcf.mesh_size
    nl = 1.0 / Norm(grad(lsetp1)) * grad(lsetp1)
    gp_facets = GetFacetsWithNeighborTypes(mesh, a=hasneg, b=hasif)
    ld_neg = {"levelset": lsetp1, "domain_type": NEG}
    ld_if = {"levelset": lsetp1, "domain_type": IF}
    a = BilinearForm(V)
    a += SymbolicBFI(ld_neg, form=grad(u) * grad(v), definedonelements=hasneg)
    a += SymbolicBFI(ld_if, form=-(grad(u) * nl) * v - (grad(v) * nl) * u
                     + 20.0 / h * u * v)
    a += SymbolicFacetPatchBFI(form=0.1 / (h * h) * (u - u.Other())
                               * (v - v.Other()),
                               definedonelements=gp_facets)
    a.Assemble()
    f = LinearForm(V)
    f += SymbolicLFI(ld_neg, form=v, definedonelements=hasneg)
    f.Assemble()
    active = GetDofsOfElements(V, hasneg)
    gfu = GridFunction(V)
    gfu.vec.data = a.mat.Inverse(freedofs=active) * f._vec
    sol = np.asarray(gfu.vec)
    assert np.all(np.isfinite(sol))
    # mean value over NEG positive (Poisson with f=1, zero Nitsche boundary)
    mean = Integrate(ld_neg, cf=gfu, mesh=mesh, order=3)
    assert mean > 0


def test_gmsh_roundtrip(tmp_path):
    mesh = MakeUnstructuredMesh(dim=2, npts=60, seed=7)
    p = str(tmp_path / "m.msh")
    WriteGmsh(mesh, p)
    m2 = ReadGmsh(p)
    assert m2.ne == mesh.ne and m2.nv == mesh.nv and m2.et == "trig"
    # boundary ids preserved through the facet tag path
    b1 = np.sort(mesh.bc_of_facet_np[mesh.boundary_facets_np])
    b2 = np.sort(m2.bc_of_facet_np[m2.boundary_facets_np])
    assert (b1 == b2).all()
    vol = Integrate(cf=1.0, mesh=m2, order=1)
    assert abs(vol - 1.0) < 1e-12


def test_gmsh_mixed_cell_types_composite(tmp_path):
    """A .msh mixing trig and quad cells of the same dimension must not
    silently drop either type: ReadGmsh returns a CompositeMesh with both
    groups (code-review regression)."""
    import warnings

    from ngsxfem_tpu.mesh.composite import CompositeMesh

    # unit square: left half = 2 trigs, right half = 1 quad (5 nodes)
    msh = """$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
6
1 0 0 0
2 0.5 0 0
3 1 0 0
4 0 1 0
5 0.5 1 0
6 1 1 0
$EndNodes
$Elements
3
1 2 1 1 1 2 5
2 2 1 1 1 5 4
3 3 1 1 2 3 6 5
$EndElements
"""
    p = tmp_path / "mixed.msh"
    p.write_text(msh)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        m = ReadGmsh(str(p))
    assert isinstance(m, CompositeMesh)
    assert any("mixed cell types" in str(w.message) for w in rec)
    ets = sorted(sm.et for sm in m.submeshes)
    assert ets == ["quad", "trig"]
    assert m.ne == 3 and m.nv == 6


def test_material_regions_and_region_wise(tmp_path):
    """Material regions + Integrate(region_wise=True) (VERDICT r3 item 8;
    reference passes region_wise through to NGSolve materials,
    python/__init__.py:281,358): per-region sums, Materials() regex,
    Gmsh material-tag round trip."""
    base = MakeStructured2DMesh(quads=False, nx=4, ny=4)
    cent = base.vertices_np[base.elements_np].mean(1)
    mat = np.where(cent[:, 0] < 0.5, 1, 2).astype(np.int32)
    m = MeshFromArrays("trig", base.vertices_np, base.elements_np,
                       mat_of_el=mat, mat_names={1: "left", 2: "right"})
    assert m.GetMaterials() == ("left", "right")
    assert m.Materials("left").Mask().sum() == int((mat == 1).sum())
    assert m.Materials("left|right").Mask().all()
    assert m.Materials("nomatch").Mask().sum() == 0

    vols = Integrate(cf=1.0, mesh=m, order=1, region_wise=True)
    assert np.allclose(vols, [0.5, 0.5], atol=1e-12)

    # region_wise on a CUT integral: NEG = {x < 0.25} lies entirely in
    # material "left"
    lsgf = _p1(m, x - 0.25)
    sums = Integrate({"levelset": lsgf, "domain_type": NEG}, cf=1.0,
                     mesh=m, order=0, region_wise=True)
    assert np.allclose(sums, [0.25, 0.0], atol=1e-12)
    tot = Integrate({"levelset": lsgf, "domain_type": NEG}, cf=1.0,
                    mesh=m, order=0)
    assert abs(float(sums.sum()) - tot) < 1e-12

    with pytest.raises(ValueError):
        Integrate(cf=1.0, mesh=m, order=1, region_wise=True,
                  element_wise=True)

    # Gmsh round trip preserves the material partition
    p = str(tmp_path / "mat.msh")
    WriteGmsh(m, p)
    m2 = ReadGmsh(p)
    assert (np.sort(m2.mat_of_el_np) == np.sort(mat)).all()
    vols2 = Integrate(cf=1.0, mesh=m2, order=1, region_wise=True)
    assert np.allclose(np.sort(vols2), [0.5, 0.5], atol=1e-12)


def test_gmsh_physical_names_by_dimension(tmp_path):
    """$PhysicalNames tags are namespaced per dimension: 2D names become
    materials, 1D names become boundary names — no cross-talk."""
    msh = """$MeshFormat
2.2 0 8
$EndMeshFormat
$PhysicalNames
3
2 1 "steel"
2 2 "air"
1 1 "bottom"
$EndPhysicalNames
$Nodes
4
1 0 0 0
2 1 0 0
3 1 1 0
4 0 1 0
$EndNodes
$Elements
3
1 2 2 1 1 1 2 3
2 2 2 2 2 1 3 4
3 1 2 1 1 1 2
$EndElements
"""
    p = str(tmp_path / "named.msh")
    with open(p, "w") as f:
        f.write(msh)
    m = ReadGmsh(p)
    assert m.GetMaterials() == ("steel", "air")
    assert (m.Materials("steel").Mask() == np.array([True, False])).all()
    assert "bottom" in m.GetBoundaries()
    vols = Integrate(cf=1.0, mesh=m, order=1, region_wise=True)
    assert np.allclose(vols, [0.5, 0.5], atol=1e-12)
