"""Differentiable unfitted FEM: gradient-based level-set shape optimization.

The BASELINE north star requires the pipeline to be "differentiable through
the level set" — a capability the C++ reference fundamentally lacks.  Every
cut-quadrature kernel here is pure jax (the case-table decomposition is a
gather, the edge-cut points are smooth functions of the vertex level-set
values), so `jax.grad` differentiates NEG-domain/interface integrals with
respect to the level-set dof vector exactly (the derivative of the
*discrete* functional).

Demo: recover the radius of a circle so that its enclosed area matches a
target, by Newton's method on r -> area(r) with jax.grad supplying the
exact discrete derivative dA/dr (the shape derivative; analytically
2*pi*r up to O(h^2) geometry error).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ngsxfem_tpu.mesh.structured import MakeStructured2DMesh
from ngsxfem_tpu.mesh.mesh import map_points, det_and_inv
from ngsxfem_tpu.ops.straightcut import cut_rule_element, eps_guard


def make_area_fn(nx=32):
    mesh = MakeStructured2DMesh(quads=False, nx=nx, ny=nx)
    coords = jnp.asarray(mesh.vertices_np[mesh.elements_np])
    elems = mesh.elements_np
    vdist = jnp.asarray(np.sqrt(((mesh.vertices_np - 0.5) ** 2).sum(1)))

    @jax.jit
    def area(r):
        phi = vdist - r                       # level-set dofs (differentiable)
        vals = eps_guard(phi[elems])
        rule = cut_rule_element("trig", vals, 2)
        _, J = map_points("trig", coords, rule.pts)
        detJ, _ = det_and_inv(J)
        return jnp.sum(rule.w * (rule.side == 0) * jnp.abs(detJ))

    return area


def run(nx=32, target_area=0.25, r0=0.2, steps=6, verbose=True):
    area = make_area_fn(nx)
    dA = jax.grad(area)
    r = r0
    for k in range(steps):
        a = float(area(r))
        g = float(dA(r))
        if verbose:
            print(f"step {k}: r={r:.6f} area={a:.6f} dA/dr={g:.4f} "
                  f"(2*pi*r={2*np.pi*r:.4f})")
        r = r - (a - target_area) / g         # Newton on area(r) = target
    final = float(area(r))
    if verbose:
        r_exact = np.sqrt(target_area / np.pi)
        print(f"converged r={r:.6f} (exact {r_exact:.6f}), "
              f"area={final:.8f} (target {target_area})")
    return r, final


def compliance_sensitivity(nx=12, r0=0.33):
    """End-to-end differentiation THROUGH THE SOLVE: d(compliance)/d(radius)
    of the fictitious-domain Poisson problem, with the linear solve made
    differentiable via jax.scipy's CG (implicit-function theorem)."""
    from ngsxfem_tpu.models.poisson import (UnfittedPoisson,
                                            cut_poisson_elmats,
                                            cut_poisson_rhs_elvecs)

    m = UnfittedPoisson(nx=nx, dim=2, order=1, dtype=jnp.float64)
    coords = jnp.asarray(m.mesh.vertices_np[m.mesh.elements_np])
    elems = m.mesh.elements_np
    e2d = m.el2dof
    vdist = jnp.asarray(np.sqrt(((m.mesh.vertices_np - 0.5) ** 2).sum(1)))

    def compliance(r):
        phi = vdist - r
        vals = phi[elems]
        A = cut_poisson_elmats("trig", 1, coords, vals, 20.0)
        fe = cut_poisson_rhs_elvecs(
            "trig", 1, coords, vals,
            lambda p: jnp.ones(p.shape[:-1], p.dtype))
        n = m.ndof
        b = jnp.zeros((n,)).at[e2d.reshape(-1)].add(fe.reshape(-1))
        active = jnp.any(vals < 0, axis=1)
        ad = jnp.zeros((n,), bool).at[jnp.asarray(e2d.reshape(-1))].max(
            jnp.repeat(active, e2d.shape[1]))

        def mv(xv):
            ye = jnp.einsum("eij,ej->ei", A, xv[e2d])
            yv = jnp.zeros_like(xv).at[e2d.reshape(-1)].add(ye.reshape(-1))
            return jnp.where(ad, yv, xv)

        bm = jnp.where(ad, b, 0.0)
        x_sol, _ = jax.scipy.sparse.linalg.cg(mv, bm, tol=1e-12, maxiter=400)
        return jnp.vdot(bm, x_sol)

    return compliance


if __name__ == "__main__":
    run()
    comp = compliance_sensitivity()
    r0 = 0.33
    dc = float(jax.grad(comp)(r0))
    eps = 1e-5
    fd = (float(comp(r0 + eps)) - float(comp(r0 - eps))) / (2 * eps)
    print(f"dC/dr autodiff {dc:.6e} vs FD {fd:.6e}")
