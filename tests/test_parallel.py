"""Sharded-vs-single-device bitwise checks (the distributed acceptance
pattern from SURVEY.md §4): element-sharded Integrate and assembly must
reproduce the single-device results."""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngsxfem_tpu import (
    NEG, IF, H1, CoefficientFunction, GridFunction, Integrate,
    InterpolateToP1, MakeStructured2DMesh, sqrt, x, y, grad,
    BilinearForm, SymbolicBFI,
)
from ngsxfem_tpu.parallel.sharding import (
    device_mesh, shard_mesh, shard_space, virtual_cpu_devices,
)


def _setup(nx=16):
    mesh = MakeStructured2DMesh(quads=False, nx=nx, ny=nx)
    lset = GridFunction(H1(mesh, order=1))
    InterpolateToP1(sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2) - 0.3, lset)
    return mesh, lset


def test_sharded_integrate_matches():
    mesh, lset = _setup()
    ref = Integrate({"levelset": lset, "domain_type": NEG}, x * y, mesh, order=4)
    dm = device_mesh(devices=virtual_cpu_devices())
    shard_mesh(mesh, dm)
    shard_space(lset.space, dm)
    val = Integrate({"levelset": lset, "domain_type": NEG}, x * y, mesh, order=4)
    assert abs(val - ref) < 1e-12


def test_sharded_assembly_matches():
    mesh, lset = _setup(nx=8)
    Vh = H1(mesh, order=1)
    u, v = Vh.TnT()
    a = BilinearForm(Vh)
    a += SymbolicBFI({"levelset": lset, "domain_type": NEG}, form=grad(u) * grad(v))
    a.Assemble()
    ref = np.asarray(a.mat.todense())

    dm = device_mesh(devices=virtual_cpu_devices())
    shard_mesh(mesh, dm)
    shard_space(lset.space, dm)
    shard_space(Vh, dm)
    a2 = BilinearForm(Vh)
    a2 += SymbolicBFI({"levelset": lset, "domain_type": NEG}, form=grad(u) * grad(v))
    a2.Assemble()
    got = np.asarray(a2.mat.todense())
    assert np.abs(got - ref).max() < 1e-13


def test_model_spmd_multichip():
    from ngsxfem_tpu.models.poisson import UnfittedPoisson

    m = UnfittedPoisson(nx=4, dim=3, order=1, dtype=jnp.float64)
    step, args = m.spmd_step(devices=virtual_cpu_devices())
    xsol, res = step(*args)
    assert float(res) < 1e-4


def test_model_spmd_dof_sharded_matches_replicated():
    """Dof-sharded halo path (parallel/halo.py): interior dofs sharded,
    psum payload = shared-layer only — must reproduce the replicated-psum
    path to machine precision on the virtual device mesh."""
    from ngsxfem_tpu.models.poisson import UnfittedPoisson

    devs = virtual_cpu_devices()
    m = UnfittedPoisson(nx=16, dim=3, order=1, dtype=jnp.float64)
    step, args = m.spmd_step(devices=devs)
    x_rep, res_rep = step(*args)
    jstep, sargs, merge = m.spmd_step_sharded(devices=devs, maxiter=25)
    xi, xs, res_sh = jstep(*sargs)
    x_sh = merge(xi, xs)
    assert xs.size < m.ndof / 2, (xs.size, m.ndof)  # halo layer, not ndof
    d = np.abs(np.asarray(x_rep) - x_sh).max()
    assert d < 1e-6, d  # iterative roundoff amplification only
    assert abs(float(res_rep) - float(res_sh)) < 1e-8
    # single CG step isolates one operator application + dot products:
    # summation-order roundoff only, no iterative amplification
    jstep1, sargs1, merge1 = m.spmd_step_sharded(devices=devs, maxiter=1)
    xi1, xs1, _ = jstep1(*sargs1)
    step1, args1 = m.spmd_step(devices=devs)
    # replicated path with 1 iteration: rebuild via krylov cg maxiter=1 is
    # baked in spmd_step; compare against dense single-device operator
    from ngsxfem_tpu.solvers.krylov import cg
    b = np.asarray(jnp.where(m.active_dofs, 1.0, 0.0))
    with jax.default_device(devs[0]):
        mv = lambda z: m.apply(m.vertices, m.lset, z)
        x1_ref, _, _ = cg(mv, jnp.asarray(b, dtype=jnp.float64), maxiter=1,
                          tol=0.0)
    d1 = np.abs(np.asarray(x1_ref) - merge1(xi1, xs1)).max()
    assert d1 < 1e-12, d1


def test_sharded_spacetime_assembly_matches():
    """The space-time slab assembly shards like the stationary one: GSPMD
    over the 8-device element axis reproduces the single-device slab matrix
    (the moving-domain per-slab system, SURVEY §2.8 acceptance pattern)."""
    from ngsxfem_tpu import (
        CreateTimeRestrictedGF, ScalarTimeFE, SpaceTimeFESpace,
        SpaceTimeInterpolateToP1, SymbolicFacetPatchBFI, dt, fix_t,
        specialcf, tref,
    )

    def slab_matrix(shard):
        mesh = MakeStructured2DMesh(quads=False, nx=8, ny=8)
        V = H1(mesh, order=1, dgjumps=True)
        st = SpaceTimeFESpace(V, ScalarTimeFE(1))
        lset = GridFunction(st)
        SpaceTimeInterpolateToP1(
            sqrt((x - 0.4 - 0.2 * tref) ** 2 + (y - 0.5) ** 2) - 0.3,
            tref, lset)
        lset_bot = CreateTimeRestrictedGF(lset, 0.0)
        if shard:
            dm = device_mesh(devices=virtual_cpu_devices())
            shard_mesh(mesh, dm)
            shard_space(V, dm)
            shard_space(st, dm)
        u, v = st.TnT()
        h = specialcf.mesh_size
        a = BilinearForm(st)
        a += SymbolicBFI({"levelset": lset, "domain_type": NEG},
                         form=dt(u) * v + grad(u) * grad(v), time_order=2)
        a += SymbolicBFI({"levelset": lset_bot, "domain_type": NEG},
                         form=fix_t(u, 0) * fix_t(v, 0))
        a += SymbolicFacetPatchBFI(
            form=1.0 / (h * h) * (u - u.Other()) * (v - v.Other()),
            time_order=1)
        a.Assemble()
        return np.asarray(a.mat.todense())

    ref = slab_matrix(shard=False)
    got = slab_matrix(shard=True)
    assert np.abs(got - ref).max() < 1e-12
