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


class LRUCache:
    """Bounded signature->compiled-program cache with LRU eviction.

    Long parameter sweeps in one process otherwise accumulate compiled
    executables without bound — the exact failure mode tests/run_suite.sh
    documents for XLA:CPU (mmap'd code pages exhausting vm.max_map_count).
    """

    def __init__(self, maxsize=128):
        from collections import OrderedDict

        self.maxsize = maxsize
        self._d = OrderedDict()

    def get(self, key, default=None):
        v = self._d.get(key, default)
        if key in self._d:
            self._d.move_to_end(key)
        return v

    def __setitem__(self, key, value):
        self._d[key] = value
        self._d.move_to_end(key)
        while len(self._d) > self.maxsize:
            self._d.popitem(last=False)

    def __contains__(self, key):
        return key in self._d

    def __len__(self):
        return len(self._d)

    def clear(self):
        self._d.clear()


class DynSlots:
    """Ordered registry of dynamic array holders discovered in a CF graph.

    Keys are (id(holder), attr): every mutable array AND every large static
    index table is passed as a jit *argument* — embedding even a 14k-row
    array constant costs ~35x more XLA lowering time than passing it in.
    """

    def __init__(self):
        self.holders = []  # list of (holder_obj, attr, getter)
        self._index = {}

    def slot(self, holder, attr, getter):
        key = (id(holder), attr)
        if key not in self._index:
            self._index[key] = len(self.holders)
            self.holders.append((holder, attr, getter))
        return self._index[key]

    def arrays(self):
        return [jnp.asarray(get()) for _, _, get in self.holders]

    def env(self, args):
        return {(id(h), attr): a for (h, attr, _), a in zip(self.holders, args)}


def dyn_get(dyn, holder, attr, default):
    if not dyn:
        return default
    return dyn.get((id(holder), attr), default)


def register_space(space, slots: DynSlots):
    """Register a space's index tables as dynamic jit inputs."""
    slots.slot(space, "el2dof", lambda s=space: s.el2dof)
    for extra in ("eldof_dom", "eldof_active"):
        if hasattr(space, extra):
            slots.slot(space, extra, lambda s=space, a=extra: getattr(s, a))
    if hasattr(space, "spacefes"):  # space-time tensor space
        register_space(space.spacefes, slots)


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
        s = slots.slot(cf, "value", lambda p=cf: jnp.asarray(p.value))
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
        s = slots.slot(cf, "values", lambda e=cf: e.values)
        return ("ev", s)
    if isinstance(cf, C.FacetValuesCF):
        s = slots.slot(cf, "values", lambda e=cf: e.values)
        return ("fv", s)
    if isinstance(cf, GridFunction):
        s = slots.slot(cf, "vec", lambda g=cf: g._arr)
        register_space(cf.space, slots)
        return ("gf", obj_uid(cf.space), s)
    if isinstance(cf, GradGF):
        s = slots.slot(cf.gf, "vec", lambda g=cf.gf: g._arr)
        register_space(cf.gf.space, slots)
        return ("dgf", obj_uid(cf.gf.space), s)
    if isinstance(cf, ProxyFunction):
        register_space(cf.space, slots)
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
    """Register mesh vertices + element table (+ deformation) as inputs."""
    slots.slot(mesh, "vertices", lambda m=mesh: m.vertices)
    slots.slot(mesh, "elements", lambda m=mesh: m.elements)
    if mesh.deformation is not None:
        d = mesh.deformation
        slots.slot(d, "vec", lambda g=d: g._arr)
        register_space(d.space, slots)
