"""Ghost-penalty variants: facet-patch vs skeleton dn-jump stabilization,
plus exactness of the dn operator (exact polynomial directional derivative
vs the reference's FD stencils)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_fictdom_dn_ghostpen():
    from examples import fictdom_dn_ghostpen

    err = fictdom_dn_ghostpen.run(nx=20, order=1, verbose=False)
    assert err < 0.08, err


def test_fictdom_dn_ghostpen_order2():
    from examples import fictdom_dn_ghostpen

    err = fictdom_dn_ghostpen.run(nx=20, order=2, verbose=False)
    assert err < 0.02, err


def test_dn_exactness():
    """dn(u,k) is EXACT for polynomials up to the space order (the
    Chebyshev-Vandermonde directional derivative, forms/evaluate.py
    _dnk_factor — replacing the reference's FD stencils,
    xfem/ghostpenalty.cpp:8-130)."""
    import jax.numpy as jnp
    from ngsxfem_tpu import MakeStructured2DMesh, H1, GridFunction, x, y
    from ngsxfem_tpu.forms.assemble import Integral, _skeleton_ctx
    from ngsxfem_tpu.forms.evaluate import _dnk_factor
    from ngsxfem_tpu.cf.context import eval_pure
    from ngsxfem_tpu.cf.coefficient import wrap

    mesh = MakeStructured2DMesh(quads=False, nx=3, ny=3)
    order = 3
    V = H1(mesh, order=order)
    gf = GridFunction(V)
    gf.Set(x**3 + x * y * y)  # degree 3: in the space exactly

    integ = Integral(form=wrap(0.0), skeleton=True)
    ctx, e1, e2, w, mask = _skeleton_ctx(integ, mesh, 2 * order)
    n = ctx._normal  # (F, Q, 2)
    xs = jnp.broadcast_to(eval_pure(wrap(x), ctx), w.shape)
    ys = jnp.broadcast_to(eval_pure(wrap(y), ctx), w.shape)

    dofs = jnp.asarray(gf._arr)[V.el2dof[e1]]  # (F, ndl)
    for k, exact in [
        (1, (3 * xs**2 + ys**2) * n[..., 0] + 2 * xs * ys * n[..., 1]),
        (2, 6 * xs * n[..., 0] ** 2 + 2 * ys * 2 * n[..., 0] * n[..., 1]
            + 2 * xs * n[..., 1] ** 2),
        (3, 6 * n[..., 0] ** 3 + 6 * n[..., 0] * n[..., 1] ** 2),
    ]:
        arr = _dnk_factor(mesh.et, order, k, ctx)  # (F, Q, ndl)
        num = jnp.einsum("fqi,fi->fq", arr, dofs)
        err = float(jnp.max(jnp.abs(num - exact)))
        assert err < 5e-11 * (10 ** k), (k, err)


def test_library_dnjump_matches_manual():
    """The packaged dnjump helper (forms/proxies.py) equals the hand-built
    sign-parity expression dn(u,k) -/+ dn(u.Other(),k) used by the reference's
    ghost-penalty tutorials — assembled matrices must be identical."""
    from ngsxfem_tpu import (H1, BilinearForm, MakeStructured2DMesh,
                             SymbolicBFI, dn, dnjump, specialcf)

    mesh = MakeStructured2DMesh(quads=False, nx=5, ny=5)
    V = H1(mesh, order=2, dgjumps=True)
    u, v = V.TnT()
    h = specialcf.mesh_size

    for k in (1, 2):
        manual_u = (dn(u, k) - dn(u.Other(), k) if k % 2 == 0
                    else dn(u, k) + dn(u.Other(), k))
        manual_v = (dn(v, k) - dn(v.Other(), k) if k % 2 == 0
                    else dn(v, k) + dn(v.Other(), k))
        a1 = BilinearForm(V)
        a1 += SymbolicBFI(form=h ** (2 * k + 1) * manual_u * manual_v,
                          skeleton=True)
        a1.Assemble()
        a2 = BilinearForm(V)
        a2 += SymbolicBFI(form=h ** (2 * k + 1) * dnjump(u, k) * dnjump(v, k),
                          skeleton=True)
        a2.Assemble()
        v1 = np.asarray(a1.mat.ell().vals)
        v2 = np.asarray(a2.mat.ell().vals)
        assert np.array_equal(v1, v2), (k, np.abs(v1 - v2).max())
