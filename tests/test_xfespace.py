"""XFESpace structural tests (port of tests/pytests/test_xfes_ndof.py ideas)
plus a formulation-equivalence cross-check: the XFEM (enrichment) and CutFEM
(two-field) formulations span the same discrete space, so the Nitsche
interface solves must agree to solver precision.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngsxfem_tpu import (
    IF, H1, XFESpace, GridFunction, InterpolateToP1, MakeStructured2DMesh,
    CutInfo, sqrt, x, y,
)


@pytest.mark.parametrize("order", [1, 2])
def test_xfes_ndof(order):
    mesh = MakeStructured2DMesh(quads=False, nx=8, ny=8)
    lsetp1 = GridFunction(H1(mesh, order=1))
    InterpolateToP1(sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2) - 0.3, lsetp1)
    Vh = H1(mesh, order=order)
    Vhx = XFESpace(Vh, lsetp1)
    ci = Vhx.GetCutInfo()
    cutels = ci.GetElementsOfType(IF).np
    manual = np.zeros(Vh.ndof, dtype=bool)
    manual[Vh.el2dof_np[cutels].ravel()] = True
    assert Vhx.ndof == manual.sum()
    assert Vhx.ndof > 0
    # each xdof enriches exactly one side
    assert set(np.unique(Vhx.dom_of_xdof)) <= {0, 1}


def test_xfem_equals_cutfem():
    from examples import cutfem, nxfem

    e1 = cutfem.run(nx=10, order=1, verbose=False)
    e2 = nxfem.run(nx=10, order=1, verbose=False)
    assert abs(e1 - e2) < 1e-9, (e1, e2)


def test_xfespace_trace_local_dofs_and_condense():
    """trace=True marks outer-rim face bubbles LOCAL (xFESpace.cpp:72-97);
    the condensed solve must match the full solve."""
    import numpy as np
    import jax.numpy as jnp
    from ngsxfem_tpu import (
        MakeStructured3DMesh, H1, GridFunction, InterpolateToP1, CutInfo,
        XFESpace, sqrt, x, y, z,
    )
    from ngsxfem_tpu.solvers.condense import condensed_solve
    from ngsxfem_tpu.solvers.sparse import SparseMatrix

    mesh = MakeStructured3DMesh(hexes=False, nx=4, ny=4, nz=4)
    base = H1(mesh, order=3)  # order 3: tets have face bubbles
    lsetp1 = GridFunction(H1(mesh, order=1))
    InterpolateToP1(sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2) - 0.3,
                    lsetp1)
    ci = CutInfo(mesh, lsetp1)
    Vx = XFESpace(base, ci, trace=True)
    loc = Vx.LocalDofs().np
    assert loc.any(), "no LOCAL dofs marked"
    assert not loc.all()
    # free-with-coupling excludes the local dofs
    assert Vx.FreeDofs(coupling=True).np.sum() == (~loc).sum()

    # condensed solve == direct solve on an SPD test matrix with the same
    # sparsity role (A = stiffness-like random SPD in COO form)
    rng = np.random.default_rng(0)
    n = Vx.ndof
    k = min(n, 400)
    sel = rng.choice(n, size=k, replace=False)
    import scipy.sparse as sp

    D = sp.random(k, k, density=0.05, random_state=0)
    A = (D @ D.T + 10 * sp.eye(k)).tocoo()
    rows = sel[A.row]
    cols = sel[A.col]
    full_rows = np.concatenate([rows, np.arange(n)])
    full_cols = np.concatenate([cols, np.arange(n)])
    full_vals = np.concatenate([A.data, np.full(n, 5.0)])
    Asp = SparseMatrix(full_rows, full_cols, jnp.asarray(full_vals), (n, n))
    b = jnp.asarray(rng.standard_normal(n))
    x_c = condensed_solve(Asp, b, Vx.LocalDofs())
    import scipy.sparse.linalg as spla

    x_ref = spla.spsolve(Asp.to_scipy().tocsc(), np.asarray(b))
    assert np.max(np.abs(np.asarray(x_c) - x_ref)) < 1e-8


def test_xfes_dirichlet_where_cut_touches_boundary():
    """Reference xFESpace.cpp:368-399: an enrichment dof is Dirichlet iff its
    base dof is Dirichlet and it supports a boundary element crossed by the
    interface; interfaces that stay interior produce no Dirichlet xdofs."""
    from ngsxfem_tpu import (MakeStructured2DMesh, H1, GridFunction,
                             InterpolateToP1, CutInfo, x, y)
    from ngsxfem_tpu.fem.xfespace import XFESpace

    mesh = MakeStructured2DMesh(quads=False, nx=6, ny=6)
    base = H1(mesh, order=1, dirichlet=[1, 2, 3, 4])

    l = GridFunction(H1(mesh, order=1))
    InterpolateToP1(y - 0.52, l)  # crosses left/right boundary
    X = XFESpace(base, CutInfo(mesh, l))
    assert X.dirichlet_dofs.sum() > 0
    assert (~X.FreeDofs().np == X.dirichlet_dofs).all()

    l2 = GridFunction(H1(mesh, order=1))
    InterpolateToP1((x - 0.5) ** 2 + (y - 0.5) ** 2 - 0.09, l2)  # interior
    X2 = XFESpace(base, CutInfo(mesh, l2))
    assert X2.dirichlet_dofs.sum() == 0
