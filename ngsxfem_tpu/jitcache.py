"""Signature-keyed jit compilation of whole pipelines.

Eager per-op dispatch costs ~0.3 s *per primitive* on first execution (XLA
compiles each op); a full Integrate/Assemble touches O(100) primitives.  We
instead trace the complete pipeline into ONE XLA program, keyed by a
*structural signature* of the CF graph + mesh/space identities, with all
mutable arrays (GridFunction vectors, element-value tables, parameters, mesh
vertices) passed as jit *arguments*.  Re-running the same structure with new
data (time stepping, Newton loops, benchmarks) then costs zero recompiles,
and the persistent XLA disk cache makes repeated processes warm-start.
"""
from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp

from .cf import coefficient as C

_uid_counter = itertools.count()


def new_uid():
    return next(_uid_counter)


def obj_uid(obj):
    """Stable per-object uid (assigned lazily)."""
    u = getattr(obj, "_ngs_uid", None)
    if u is None:
        u = new_uid()
        try:
            object.__setattr__(obj, "_ngs_uid", u)
        except Exception:
            obj._ngs_uid = u
    return u


class DynSlots:
    """Ordered registry of dynamic array holders discovered in a CF graph."""

    def __init__(self):
        self.holders = []  # list of (holder_obj, getter)
        self._index = {}

    def slot(self, holder, getter):
        key = id(holder)
        if key not in self._index:
            self._index[key] = len(self.holders)
            self.holders.append((holder, getter))
        return self._index[key]

    def arrays(self):
        return [jnp.asarray(get(h)) for h, get in self.holders]

    def env(self, args):
        return {id(h): a for (h, _), a in zip(self.holders, args)}


def cf_signature(cf, slots: DynSlots):
    """Hashable structural signature of a CF graph; registers dynamic leaves."""
    from .fem.gridfunction import GridFunction, GradGF
    from .forms.proxies import ProxyFunction

    t = type(cf)
    custom = getattr(cf, "_signature", None)
    if custom is not None:
        return custom(slots)
    if isinstance(cf, C.Constant):
        return ("c", cf.value)
    if isinstance(cf, C.Parameter):
        s = slots.slot(cf, lambda p=cf: jnp.asarray(p.value))
        return ("par", s)
    if isinstance(cf, C.Coord):
        return ("x", cf.axis)
    if isinstance(cf, C.Scale):
        return ("s", cf.s, cf_signature(cf.a, slots))
    if isinstance(cf, C.Pow):
        return ("pow", cf.p, cf_signature(cf.a, slots))
    if isinstance(cf, C.UnaryOp):
        return ("u", cf.fname, cf_signature(cf.a, slots))
    if isinstance(cf, C.Component):
        return ("idx", cf.idx, cf_signature(cf.a, slots))
    if isinstance(cf, C.Reshaped):
        return ("rs", cf.dims, cf_signature(cf.child, slots))
    if isinstance(cf, C.VectorCF):
        return ("vec",) + tuple(cf_signature(c, slots) for c in cf.comps)
    if isinstance(cf, C.NormCF):
        return ("norm", cf_signature(cf.a, slots))
    if isinstance(cf, C.IfPosCF):
        return ("ifp", cf_signature(cf.c, slots), cf_signature(cf.a, slots),
                cf_signature(cf.b, slots))
    if isinstance(cf, C.SpecialCF):
        return ("sp", cf.kind, cf.dims)
    if isinstance(cf, C.ElementValuesCF):
        s = slots.slot(cf, lambda e=cf: e.values)
        return ("ev", s)
    if isinstance(cf, C.FacetValuesCF):
        s = slots.slot(cf, lambda e=cf: e.values)
        return ("fv", s)
    if isinstance(cf, GridFunction):
        s = slots.slot(cf, lambda g=cf: g._arr)
        return ("gf", obj_uid(cf.space), s)
    if isinstance(cf, GradGF):
        s = slots.slot(cf.gf, lambda g=cf.gf: g._arr)
        return ("dgf", obj_uid(cf.gf.space), s)
    if isinstance(cf, ProxyFunction):
        return ("px", obj_uid(cf.space), cf.test, cf.block_key, cf.op, cf.op_args)
    # binary nodes
    for name, cls in (("+", C.Add), ("*", C.Mul), ("ip", C.InnerProduct),
                      ("mv", C.MatVec), ("/", C.Div)):
        if isinstance(cf, cls):
            return (name, cf_signature(cf.a, slots), cf_signature(cf.b, slots))
    raise NotImplementedError(f"signature for {t.__name__}")


def mesh_signature(mesh):
    # deformation keyed by the deforming space identity (its dof VECTOR is a
    # dynamic argument, so Set/Unset cycles in time loops never recompile)
    dkey = None if mesh.deformation is None else obj_uid(mesh.deformation.space)
    return (obj_uid(mesh), mesh.et, mesh.ne, dkey)


def register_mesh_dynamics(mesh, slots: DynSlots):
    """Register mesh vertices (+ deformation dofs) as dynamic inputs."""
    slots.slot(mesh, lambda m=mesh: m.vertices)
    if mesh.deformation is not None:
        d = mesh.deformation
        slots.slot(d, lambda g=d: g._arr)
