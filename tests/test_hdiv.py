"""HDiv (RT0) space + dn(hdiv=True) normal-derivative diff-op
(reference DiffOpDuDnkHDiv, xfem/ghostpenalty.cpp:140-199)."""
import numpy as np
import jax.numpy as jnp

from ngsxfem_tpu import (
    MakeStructured2DMesh, MakeStructured3DMesh, HDiv, GridFunction,
    Integrate, CoefficientFunction, InnerProduct, x, y,
)


def _rt0_interpolate_constant(mesh, v0):
    """RT0 dofs of a constant field = outward fluxes over the facets."""
    fverts = mesh.vertices_np[mesh.facets_np]  # (nf, nvf, d)
    d = mesh.dim
    if d == 2:
        t = fverts[:, 1] - fverts[:, 0]
        n = np.stack([t[:, 1], -t[:, 0]], axis=1)  # length-weighted normal
    else:
        n = 0.5 * np.cross(fverts[:, 1] - fverts[:, 0],
                           fverts[:, 2] - fverts[:, 0])
    # orient outward from the facet's first adjacent element (the space's
    # global flux convention)
    e0 = mesh.facet2el_np[:, 0]
    cent_el = mesh.vertices_np[mesh.elements_np[e0]].mean(axis=1)
    cent_f = fverts.mean(axis=1)
    s = np.sign(np.einsum("fd,fd->f", n, cent_f - cent_el))
    n = n * s[:, None]
    return n @ np.asarray(v0)


def test_rt0_reproduces_constants():
    for mesh in [MakeStructured2DMesh(quads=False, nx=3, ny=3),
                 MakeStructured3DMesh(hexes=False, nx=2, ny=2, nz=2)]:
        V = HDiv(mesh, order=0)
        assert V.ndof == mesh.nfacets
        v0 = np.arange(1, mesh.dim + 1, dtype=float)
        gf = GridFunction(V)
        gf._set_array(jnp.asarray(_rt0_interpolate_constant(mesh, v0)))
        v0cf = CoefficientFunction(tuple(float(c) for c in v0))
        err = Integrate(cf=InnerProduct(gf - v0cf, gf - v0cf), mesh=mesh,
                        order=3)
        assert abs(err) < 1e-22, err


def test_rt0_divergence_theorem():
    mesh = MakeStructured2DMesh(quads=False, nx=4, ny=4)
    V = HDiv(mesh, order=0)
    rng = np.random.default_rng(3)
    gf = GridFunction(V)
    gf._set_array(jnp.asarray(rng.standard_normal(V.ndof)))
    # net boundary flux: boundary facet dofs are outward by convention
    bf = mesh.boundary_facets_np
    flux = float(np.asarray(gf._arr)[bf].sum())
    # divergence integral: RT0 div is constant per element
    from ngsxfem_tpu.cf.context import EvalCtx

    cent = jnp.full((mesh.ne, 1, mesh.dim), 1.0 / 3.0)
    ctx = EvalCtx(mesh, cent)
    _, dv = V._piola(ctx, ctx.ref_pts)  # (E,1,nfel)
    dofs = jnp.asarray(gf._arr)[V.el2dof]
    div_el = jnp.einsum("eqi,ei->eq", dv, dofs)[:, 0]
    vol = jnp.abs(ctx.detJ)[:, 0] * 0.5
    div_int = float(jnp.sum(div_el * vol))
    assert abs(div_int - flux) < 1e-12, (div_int, flux)


def test_dn_hdiv_exact():
    """dn(u,1,hdiv=True): RT0 shapes are linear with gradient (c/detJ)*I,
    so the normal derivative is exactly (c/detJ)*n (signed); dn(u,2) = 0."""
    mesh = MakeStructured2DMesh(quads=False, nx=2, ny=2)
    V = HDiv(mesh, order=0)
    from ngsxfem_tpu.forms.assemble import Integral, _skeleton_ctx
    from ngsxfem_tpu.cf.coefficient import wrap

    integ = Integral(form=wrap(0.0), skeleton=True)
    ctx, e1, e2, w, mask = _skeleton_ctx(integ, mesh, 2)
    arr = np.asarray(V._dnk(ctx, 1))  # (F,Q,nfel,d)
    n = np.asarray(ctx.normal)
    detJ = np.asarray(ctx.detJ)
    sign = np.asarray(V.eldof_sign)[np.asarray(e1)]  # (F, nfel)
    expect = (1.0 / np.abs(detJ))[:, :, None, None] * n[:, :, None, :] \
        * sign[:, None, :, None]
    assert np.max(np.abs(arr - expect)) < 1e-12
    arr2 = V._dnk(ctx, 2)
    assert float(jnp.max(jnp.abs(arr2))) < 1e-11
