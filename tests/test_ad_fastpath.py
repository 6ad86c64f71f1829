"""Differentiability of the LATTICE fast path (VERDICT r3 item 6).

The north-star differentiability claim (BASELINE.json: "differentiable
through the level set") was previously proven only on the general
quadrature path (examples/levelset_shape_opt.py); the closed-form lattice
kernels (``assemble_vals_lattice`` / ``cut_poisson_flat_soa``) are full of
``jnp.where`` masks and clamps — exactly where silent zero-gradients hide.

This battery asserts, for a compliance objective through the FULL fast
pipeline (closed-form cut assembly -> DIA operator -> fixed-budget
Jacobi-PCG):

    lattice-path gradient == general-path (ELL quadrature) gradient == FD

and additionally checks the NEG-volume gradient of the lattice-assembled
mass against the analytic shape derivative.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ngsxfem_tpu.models.poisson import UnfittedPoisson
from ngsxfem_tpu.solvers.sparse import dia_matvec
from ngsxfem_tpu.solvers.krylov import cg

NX = 8
CG_ITERS = 80


@pytest.fixture(scope="module")
def setup():
    m = UnfittedPoisson(nx=NX, dim=3, order=1, dtype=jnp.float64)
    dst = m.dia_structure()
    dd = {k: (jnp.asarray(v) if "slots" in k else v) for k, v in dst.items()}
    offs = dst["offsets"]
    k0 = int(np.searchsorted(np.asarray(offs), 0))
    # vertex distances to the box center; radius parameterizes the lset
    vd = jnp.asarray(np.sqrt(((m.mesh.vertices_np - 0.5) ** 2).sum(1)))
    # r0: midpoint of the two vertex-distance values bracketing the model
    # radius — maximal margin to any classification change, so FD steps and
    # AD live inside one smooth sign-pattern cell
    vds = np.unique(np.asarray(vd))
    i = int(np.searchsorted(vds, 0.4))
    r0 = 0.5 * (vds[i - 1] + vds[i])
    b_dia = jnp.asarray(
        np.where(m.active_dofs[dst["perm_inv"]], 1.0, 0.0), jnp.float64)
    b_dof = jnp.asarray(np.where(m.active_dofs, 1.0, 0.0), jnp.float64)
    return m, dd, offs, k0, vd, float(r0), b_dia, b_dof


def _compliance_lattice(setup):
    m, dd, offs, k0, vd, r0, b_dia, _ = setup

    def J(r):
        lset = (vd - r).astype(jnp.float64)
        V, _ = m.assemble_vals_lattice(m.vertices, lset, dd)
        dinv = jnp.where(jnp.abs(V[k0]) > 1e-30, 1.0 / V[k0], 1.0)
        x, _, _ = cg(lambda z: dia_matvec(offs, V, z), b_dia,
                     M=lambda w: dinv * w, maxiter=CG_ITERS, tol=0.0)
        return jnp.vdot(b_dia, x)

    return J


def _compliance_general(setup):
    """Same discrete problem through the GENERAL quadrature/ELL path."""
    m, dd, offs, k0, vd, r0, _, b_dof = setup
    st = m.ell_structure()
    vals_el = m.lset_np[m.mesh.elements_np]
    ncut = int(((vals_el < 0).any(1) & (vals_el > 0).any(1)).sum())
    cap = ncut + 16
    std = {k: (jnp.asarray(v) if k != "K" else v) for k, v in st.items()}
    cols = jnp.asarray(st["ell_cols"])
    rid = jnp.arange(cols.shape[0])[:, None]

    def J(r):
        lset = (vd - r).astype(jnp.float64)
        vals, _ = m.assemble_ell_vals(m.vertices, lset, cap, std)
        d = jnp.sum(jnp.where(cols == rid, vals, 0.0), axis=1)
        dinv = jnp.where(jnp.abs(d) > 1e-30, 1.0 / d, 1.0)
        x, _, _ = cg(lambda z: jnp.sum(vals * z[cols], axis=1), b_dof,
                     M=lambda w: dinv * w, maxiter=CG_ITERS, tol=0.0)
        return jnp.vdot(b_dof, x)

    return J


def test_lattice_compliance_gradient_matches_general_and_fd(setup):
    r0 = setup[5]
    J_lat = _compliance_lattice(setup)
    J_gen = _compliance_general(setup)

    # the two paths compute the SAME discrete system (two-tier equivalence)
    j_lat0 = float(J_lat(r0))
    j_gen0 = float(J_gen(r0))
    assert abs(j_lat0 - j_gen0) < 1e-9 * abs(j_gen0), (j_lat0, j_gen0)

    g_lat = float(jax.grad(J_lat)(r0))
    g_gen = float(jax.grad(J_gen)(r0))
    eps = 1e-6
    fd = (float(J_lat(r0 + eps)) - float(J_lat(r0 - eps))) / (2 * eps)

    assert g_lat != 0.0, "lattice-path gradient died (masks/clamps)"
    # lattice AD == FD of the lattice path (differentiates the actual
    # computation; tight)
    assert abs(g_lat - fd) < 1e-5 * max(abs(fd), 1e-30), (g_lat, fd)
    # lattice AD == general-path AD (same discrete problem)
    assert abs(g_lat - g_gen) < 1e-6 * max(abs(g_gen), 1e-30), (g_lat, g_gen)


def test_lattice_volume_gradient_analytic(setup):
    """d(NEG volume)/dr through the closed-form lattice VOLUME values
    matches the analytic surface area 4*pi*r^2 to O(h^2)."""
    m, dd, offs, k0, vd, r0, _, _ = setup
    from ngsxfem_tpu.ops.straightcut import cut_rule_element, eps_guard
    from ngsxfem_tpu.mesh.mesh import map_points, det_and_inv

    c3 = jnp.asarray(m.mesh.vertices_np[m.mesh.elements_np])

    def vol(r):
        vals = eps_guard((vd - r)[m.mesh.elements_np])
        rule = cut_rule_element("tet", vals, 2)
        _, Jm = map_points("tet", c3, rule.pts)
        detJ, _ = det_and_inv(Jm)
        return jnp.sum(rule.w * (rule.side == 0) * jnp.abs(detJ))

    dv = float(jax.grad(vol)(r0))
    assert abs(dv - 4 * np.pi * r0 ** 2) < 0.06, dv
