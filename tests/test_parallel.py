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
from ngsxfem_tpu.parallel.sharding import device_mesh, shard_mesh, shard_space


def _setup(nx=16):
    mesh = MakeStructured2DMesh(quads=False, nx=nx, ny=nx)
    lset = GridFunction(H1(mesh, order=1))
    InterpolateToP1(sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2) - 0.3, lset)
    return mesh, lset


def test_sharded_integrate_matches():
    mesh, lset = _setup()
    ref = Integrate({"levelset": lset, "domain_type": NEG}, x * y, mesh, order=4)
    dm = device_mesh(len(jax.devices()))
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

    dm = device_mesh(len(jax.devices()))
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
    step, args = m.spmd_step(n_devices=len(jax.devices()))
    xsol, res = step(*args)
    assert float(res) < 1e-4
