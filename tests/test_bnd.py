"""BND-side cut info and boundary (cut) integrals.

Reference parity: CutInformation classifies BND elements too
(xfem/cutinfo.cpp:54-188 loops VOL and BND); SymbolicCutBFI dispatches on
VOL_or_BND.  Boundary elements here are the boundary facets of the tensor
mesh.
"""
import numpy as np
import pytest

from ngsxfem_tpu import (
    MakeStructured2DMesh, MakeStructured3DMesh, H1, GridFunction,
    InterpolateToP1, CutInfo, NEG, POS, IF, BilinearForm, LinearForm,
    SymbolicBFI, SymbolicLFI, Integrate, x, y, z, CoefficientFunction,
    grad, VOL, BND,
)


def test_cutinfo_bnd_classification():
    # unit square, phi = x - 0.45: left edge NEG, right edge POS,
    # top/bottom edges cut
    mesh = MakeStructured2DMesh(quads=False, nx=10, ny=10)
    lsetp1 = GridFunction(H1(mesh, order=1))
    InterpolateToP1(x - 0.45, lsetp1)
    ci = CutInfo(mesh, lsetp1)

    neg = np.asarray(ci.GetElementsOfType(NEG, BND).np)
    pos = np.asarray(ci.GetElementsOfType(POS, BND).np)
    iff = np.asarray(ci.GetElementsOfType(IF, BND).np)
    nb = len(mesh.boundary_facets_np)
    assert nb == 40
    assert neg.sum() + pos.sum() + iff.sum() == nb
    # left edge (10 segments) all NEG; right edge all POS; with the cut at
    # x=0.45 the segment [0.4,0.5] on top and bottom is IF
    assert neg.sum() == 10 + 2 * 4   # left + 4 uncut NEG segments per side
    assert pos.sum() == 10 + 2 * 5
    assert iff.sum() == 2

    # NEG-part of the boundary measure via cut ratios
    bf = mesh.boundary_facets_np
    verts = mesh.vertices_np[mesh.facets_np[bf]]
    lens = np.linalg.norm(verts[:, 1] - verts[:, 0], axis=1)
    ratios = ci.GetCutRatios(BND)
    neg_len = float(np.sum(lens * ratios))
    # exact: left edge (1.0) + 0.45 on top and bottom
    assert abs(neg_len - (1.0 + 2 * 0.45)) < 1e-12


def test_bnd_mass_matrix_perimeter():
    mesh = MakeStructured2DMesh(quads=False, nx=4, ny=4)
    V = H1(mesh, order=2)
    u, v = V.TnT()
    a = BilinearForm(V)
    a += SymbolicBFI(form=u * v, VOL_or_BND=BND)
    a.Assemble()
    one = np.ones(V.ndof)
    per = float(one @ np.asarray(a.mat.todense()) @ one)
    assert abs(per - 4.0) < 1e-12


def test_bnd_cut_integral_exact():
    # phi = x - 0.45 on the unit square: NEG part of the boundary has
    # measure 1 + 2*0.45
    mesh = MakeStructured2DMesh(quads=False, nx=5, ny=5)
    V = H1(mesh, order=1)
    lsetp1 = GridFunction(H1(mesh, order=1))
    InterpolateToP1(x - 0.45, lsetp1)
    ld = {"levelset": lsetp1, "domain_type": NEG}
    u, v = V.TnT()
    a = BilinearForm(V)
    a += SymbolicBFI(levelset_domain=ld, form=u * v, VOL_or_BND=BND)
    a.Assemble()
    one = np.ones(V.ndof)
    mneg = float(one @ np.asarray(a.mat.todense()) @ one)
    assert abs(mneg - (1.0 + 2 * 0.45)) < 1e-12

    ldp = {"levelset": lsetp1, "domain_type": POS}
    b = BilinearForm(V)
    b += SymbolicBFI(levelset_domain=ldp, form=u * v, VOL_or_BND=BND)
    b.Assemble()
    mpos = float(one @ np.asarray(b.mat.todense()) @ one)
    assert abs(mpos - (1.0 + 2 * 0.55)) < 1e-12


def test_bnd_3d_area():
    mesh = MakeStructured3DMesh(hexes=False, nx=3, ny=3, nz=3)
    V = H1(mesh, order=1)
    u, v = V.TnT()
    a = BilinearForm(V)
    a += SymbolicBFI(form=u * v, VOL_or_BND=BND)
    a.Assemble()
    one = np.ones(V.ndof)
    area = float(one @ np.asarray(a.mat.todense()) @ one)
    assert abs(area - 6.0) < 1e-12


def test_bnd_linearform_neumann():
    # -u'' = 0, u = x: du/dn = +1 at x=1, -1 at x=0; solve a pure Neumann
    # problem pinned at one dof and compare against the exact solution
    mesh = MakeStructured2DMesh(quads=False, nx=4, ny=4)
    V = H1(mesh, order=1)
    u, v = V.TnT()
    a = BilinearForm(V)
    a += SymbolicBFI(form=grad(u) * grad(v))
    a += SymbolicBFI(form=u * v)  # regularize: -> u - lap u = x exactly? no
    a.Assemble()
    # reaction term makes the PDE u - lap(u) = x with Neumann du/dn = n_x
    from ngsxfem_tpu import specialcf
    n = specialcf.normal(2)
    f = LinearForm(V)
    f += SymbolicLFI(form=x * v)
    f += SymbolicLFI(form=n[0] * v, VOL_or_BND=BND)
    f.Assemble()
    gfu = GridFunction(V)
    gfu.vec.data = a.mat.Inverse() * f.vec.data
    err = Integrate(cf=(gfu - x) * (gfu - x), mesh=mesh, order=4) ** 0.5
    assert err < 1e-10
