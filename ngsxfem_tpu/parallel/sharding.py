"""SPMD element sharding for the general pipelines.

The TPU-native replacement for the distributed layer the reference lacks
(SURVEY.md §2.8): every hot tensor in Integrate/Assemble is indexed by the
element axis, and all of them enter jitted programs as *arguments* — so
placing those arguments on an element-sharded device mesh makes XLA's SPMD
partitioner shard the whole cut-quadrature/assembly pipeline and insert the
psum for dof reductions automatically.  No program changes are needed;
`shard_mesh`/`shard_space` just re-place the arrays.

For hand-scheduled collectives (explicit shard_map + psum), see
models/poisson.py:spmd_step.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh as DeviceMesh, NamedSharding, PartitionSpec as P


def virtual_cpu_devices(n=None):
    """The virtual CPU device set (--xla_force_host_platform_device_count):
    requested explicitly by platform, because an auxiliary TPU plugin may be
    registered as the primary backend even when JAX_PLATFORMS asks for cpu."""
    try:
        devs = jax.devices("cpu")
    except RuntimeError:
        devs = jax.devices()
    return devs if n is None else devs[:n]


def device_mesh(n_devices=None, devices=None, axis_name="e"):
    devices = devices if devices is not None else jax.devices()[:n_devices]
    return DeviceMesh(np.array(devices), (axis_name,))


def shard_mesh(mesh, dm: DeviceMesh, axis_name="e"):
    """Element-shard a Mesh's arrays: elements along the element axis,
    vertices replicated."""
    esh = NamedSharding(dm, P(axis_name))
    rep = NamedSharding(dm, P())
    mesh.elements = jax.device_put(mesh.elements, esh)
    mesh.vertices = jax.device_put(mesh.vertices, rep)
    mesh.facet2el = jax.device_put(mesh.facet2el, rep)
    return mesh


def shard_space(space, dm: DeviceMesh, axis_name="e"):
    """Element-shard a space's dof map (dof vectors stay replicated)."""
    esh = NamedSharding(dm, P(axis_name))
    space.el2dof = jax.device_put(space.el2dof, esh)
    for extra in ("eldof_dom", "eldof_active"):
        if hasattr(space, extra):
            setattr(space, extra, jax.device_put(getattr(space, extra), esh))
    if hasattr(space, "spacefes"):
        shard_space(space.spacefes, dm, axis_name)
    return space


def replicate(arr, dm: DeviceMesh):
    return jax.device_put(jnp.asarray(arr), NamedSharding(dm, P()))
