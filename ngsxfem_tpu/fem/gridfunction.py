"""GridFunctions: dof vectors with CF evaluation hooks.

A GridFunction IS a CoefficientFunction (as in NGSolve); its evaluation at a
batch of quadrature points is a gather + einsum over the basis tables from
``fem.basis``.  Vectors are immutable jnp arrays — assignment replaces the
array (functional style); a thin ``.vec``/``.data`` shim keeps reference-like
scripts readable.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..jitcache import LRUCache

_SET_CACHE = LRUCache(maxsize=128)

from ..config import config
from ..cf.coefficient import CF, wrap
from ..cf.context import EvalCtx, eval_pure
from .basis import shapes, dshapes
from .space import (
    FESpace,
    H1,
    CompoundFESpace,
    CompressedFESpace,
    VectorFESpace,
)


class VecShim:
    """NGSolve-ish view of a GridFunction's dof vector.

    Supports ``gfu.vec.data = expr``, ``gfu.vec[:] = 0.0``,
    ``gfu.vec.CreateVector()``, ``gfu.vec.FV().NumPy()``.
    """

    def __init__(self, gf):
        object.__setattr__(self, "_gf", gf)

    @property
    def data(self):
        return self._gf._arr

    @data.setter
    def data(self, v):
        self._gf._set_array(jnp.asarray(v))

    def __setitem__(self, idx, v):
        arr = np.asarray(self._gf._arr).copy()
        arr[idx] = v
        self._gf._set_array(jnp.asarray(arr))

    def __getitem__(self, idx):
        return self._gf._arr[idx]

    def __len__(self):
        return self._gf._arr.shape[0]

    def __array__(self, dtype=None):
        return np.asarray(self._gf._arr, dtype=dtype)

    def CreateVector(self):
        return StandaloneVec(jnp.zeros_like(self._gf._arr))

    def FV(self):
        return self

    def NumPy(self):
        return np.asarray(self._gf._arr)

    # arithmetic delegates to the underlying array
    def __add__(self, o):
        return self._gf._arr + _a(o)

    def __sub__(self, o):
        return self._gf._arr - _a(o)

    def __mul__(self, o):
        return self._gf._arr * o

    def __rmul__(self, o):
        return o * self._gf._arr


class StandaloneVec:
    def __init__(self, arr):
        self.arr = jnp.asarray(arr)

    @property
    def data(self):
        return self.arr

    @data.setter
    def data(self, v):
        self.arr = jnp.asarray(v)

    def __array__(self, dtype=None):
        return np.asarray(self.arr, dtype=dtype)

    def __setitem__(self, idx, v):
        # NGSolve out-parameter convention (vec[:] = ..., used e.g. by
        # P2TwoGridCL.Mult(rhs, usol)): functional update of the array
        self.arr = jnp.asarray(self.arr).at[idx].set(jnp.asarray(v))

    def __getitem__(self, idx):
        return self.arr[idx]

    def __add__(self, o):
        return self.arr + _a(o)

    def __sub__(self, o):
        return self.arr - _a(o)


def _a(o):
    if isinstance(o, (VecShim, StandaloneVec)):
        return o.data
    return o


class GridFunction(CF):
    def __init__(self, space, name="gf", _parent=None, _block=None):
        self.space = space
        self.name = name
        self._parent = _parent
        self._block = _block
        if _parent is None:
            self._array = jnp.zeros((space.ndof,), dtype=config.dtype)
        vd = getattr(space, "vdim", 1)
        self.dims = () if vd == 1 else (vd,)
        if isinstance(space, CompoundFESpace):
            self.components = tuple(
                GridFunction(s, name=f"{name}.{i}", _parent=self, _block=i)
                for i, s in enumerate(space.components)
            )
        else:
            self.components = ()

    # -- dof vector ---------------------------------------------------------
    @property
    def _arr(self):
        if self._parent is not None:
            sl = self._parent.space.Range(self._block)
            return self._parent._array[sl]
        return self._array

    def _set_array(self, v):
        if self._parent is not None:
            sl = self._parent.space.Range(self._block)
            self._parent._set_array(self._parent._array.at[sl].set(v))
        else:
            self._array = jnp.asarray(v, dtype=config.dtype)

    @property
    def _array_resolved(self):
        return self._arr

    @property
    def vec(self):
        return VecShim(self) if self._parent is None else _CompVecShim(self)

    @vec.setter
    def vec(self, v):
        if isinstance(v, (VecShim, StandaloneVec)):
            v = v.data
        self._set_array(jnp.asarray(v))

    # -- interpolation ------------------------------------------------------
    def Set(self, cf, boundary=False, definedonelements=None, BND=None):
        """Nodal interpolation of `cf` (NGSolve ``GridFunction.Set`` analog)."""
        from ..jitcache import (
            DynSlots, cf_signature, mesh_signature, register_mesh_dynamics, obj_uid,
        )

        cf = wrap(cf)
        sp = self.space
        if isinstance(sp, CompoundFESpace):
            raise TypeError("Set on compound GF: use components")
        if type(sp).__name__ == "SpaceTimeFESpace":
            # reference semantics (spacetime/py_demos/set_test.py): Set on a
            # space-time GF interpolates spatially AT EACH ACTIVE TIME NODE
            # (tref fixed to the node value) into the time-major blocks
            from ..spacetime.space import TimeFixedCF

            tmp = GridFunction(sp.spacefes)
            arr = jnp.asarray(self._arr)
            for i, ti in enumerate(sp.tfe.nodes):
                tmp.Set(TimeFixedCF(cf, float(ti)), boundary=boundary,
                        definedonelements=definedonelements, BND=BND)
                arr = arr.at[i * sp.ndof_s:(i + 1) * sp.ndof_s].set(tmp._arr)
            self._set_array(arr)
            return
        scal = sp.scalar if isinstance(sp, VectorFESpace) else sp
        slots = DynSlots()
        register_mesh_dynamics(sp.mesh, slots)
        slots.slot(self, "vec", lambda g=self: g._arr)
        slots.slot(scal, "dof_rep_ref",
                   lambda s=scal: jnp.asarray(s.dof_rep_ref, dtype=config.dtype))
        slots.slot(scal, "dof_rep_elem",
                   lambda s=scal: jnp.asarray(s.dof_rep_elem))
        slots.slot(scal, "bc_of_dof", lambda s=scal: jnp.asarray(s.bc_of_dof))
        donel_key = (
            None if definedonelements is None
            else hash(np.asarray(definedonelements.np
                                 if hasattr(definedonelements, "np")
                                 else definedonelements).tobytes())
        )
        sig = ("set", obj_uid(sp), mesh_signature(sp.mesh),
               cf_signature(cf, slots), bool(boundary or BND), donel_key)
        fn = _SET_CACHE.get(sig)
        if fn is None:
            gf_self = self

            def _impl(*arrays):
                dyn = slots.env(arrays)
                cur = dyn[(id(gf_self), "vec")]
                ctx = EvalCtx(
                    sp.mesh,
                    dyn[(id(scal), "dof_rep_ref")][:, None, :],
                    elem_ids=dyn[(id(scal), "dof_rep_elem")],
                    dyn=dyn,
                )
                vals = eval_pure(cf, ctx)
                if isinstance(sp, VectorFESpace):
                    vals = jnp.broadcast_to(vals, (scal.ndof, 1, sp.vdim))
                    new = vals[:, 0, :].T.reshape(-1)  # block layout
                else:
                    vals = jnp.broadcast_to(vals, (scal.ndof, 1))
                    new = vals[:, 0]
                if boundary or BND:
                    m = dyn[(id(scal), "bc_of_dof")] > 0
                    if isinstance(sp, VectorFESpace):
                        m = jnp.tile(m, sp.vdim)
                    new = jnp.where(m, new, cur)
                if definedonelements is not None:
                    from .space import GetDofsOfElements

                    m = GetDofsOfElements(sp, definedonelements).jnp
                    new = jnp.where(m, new, cur)
                return new

            fn = jax.jit(_impl)
            _SET_CACHE[sig] = fn
        self._set_array(fn(*slots.arrays()))

    def Deriv(self):
        return GradGF(self)

    # -- CF evaluation ------------------------------------------------------
    def _eval_pure(self, ctx: EvalCtx):
        hook = getattr(self.space, "gf_eval_hook", None)
        if hook is not None:
            return hook(self, ctx)
        return gf_value(self, ctx.elem_ids, ctx.ref_pts, ctx)

    def __repr__(self):
        return f"GridFunction({self.space}, name={self.name})"


class _CompVecShim(VecShim):
    """vec shim for component grid functions.  VecShim already reads the
    RESOLVED dof view (``_arr`` = the parent's block slice) and writes route
    through ``_set_array`` back into the parent, so the full accessor
    surface (NumPy()/FV()/__array__/CreateVector()/arithmetic) works on
    components too; kept as a named class for isinstance checks."""


class GradGF(CF):
    def __init__(self, gf: GridFunction):
        self.gf = gf
        d = gf.space.mesh.dim
        vd = getattr(gf.space, "vdim", 1)
        self.dims = (d,) if vd == 1 else (vd, d)

    def _eval_pure(self, ctx: EvalCtx):
        val, gref = gf_ref_value_and_grad(self.gf, ctx.elem_ids, ctx.ref_pts,
                                          dyn=ctx.dyn)
        # push-forward: grad_phys = Jinv^T-contract: g_phys[g] = sum_d gref[d] Jinv[d,g]
        if self.dims == (ctx.mesh.dim,):
            return jnp.einsum("eqd,eqdg->eqg", gref[..., 0, :], ctx.Jinv)
        return jnp.einsum("eqcd,eqdg->eqcg", gref, ctx.Jinv)


def _space_el2dof_and_vec(gf: GridFunction, dyn=None):
    from ..jitcache import dyn_get

    sp = gf.space
    vec = dyn_get(dyn, gf, "vec", gf._arr)
    el2dof = dyn_get(dyn, sp, "el2dof", sp.el2dof)
    return sp, el2dof, vec


def _gather_dofs(sp, vec, e2d, elem_ids, offset=0):
    """vec[offset + e2d] with placeholder-0 slots of masked spaces
    (Compress/XFESpace el2dof_valid_np) zeroed — else every inactive slot
    silently reads dof `offset`."""
    dofs = vec[offset + e2d]
    valid = getattr(sp, "el2dof_valid_np", None)
    if valid is not None:
        v = jnp.asarray(valid)
        if elem_ids is not None:
            v = v[elem_ids]
        dofs = jnp.where(v, dofs, 0.0)
    return dofs


def gf_value(gf: GridFunction, elem_ids, ref_pts, ctx=None):
    """Value of gf at (elem, refpt) batches -> (E,Q) or (E,Q,vdim)."""
    sp, el2dof, vec = _space_el2dof_and_vec(gf, ctx.dyn if ctx is not None else None)
    if isinstance(sp, CompoundFESpace):
        raise TypeError("evaluate components of a compound GridFunction")
    scal_vec = vec
    vdim = getattr(sp, "vdim", 1)
    e2d = el2dof if elem_ids is None else el2dof[elem_ids]
    B = shapes(sp.mesh.et, sp.order, ref_pts)  # (E,Q,ndl)
    if vdim == 1:
        dofs = _gather_dofs(sp, scal_vec, e2d, elem_ids)  # (E,ndl)
        return jnp.einsum("eqi,ei->eq", B, dofs)
    nscal = sp.nscal
    comps = []
    for c in range(vdim):
        dofs = _gather_dofs(sp, scal_vec, e2d, elem_ids, offset=c * nscal)
        comps.append(jnp.einsum("eqi,ei->eq", B, dofs))
    return jnp.stack(comps, axis=-1)


def gf_ref_value_and_grad(gf: GridFunction, elem_ids, ref_pts, dyn=None,
                          time=None):
    """(value (E,Q,vdim), ref-grad (E,Q,vdim,d)) of gf at ref points.

    Space-time GridFunctions (e.g. the space-time mesh deformation of
    LevelSetMeshAdaptation_Spacetime, reference spacetime/lset_spacetime.py)
    are evaluated at the per-point `time` by contracting the time basis with
    the time-major dof blocks.
    """
    from ..spacetime.space import SpaceTimeFESpace

    sp = gf.space
    if isinstance(sp, SpaceTimeFESpace):
        if time is None:
            raise ValueError(
                "space-time GridFunction evaluated without a time context "
                "(use time_order>=0 integrals or RestrictGFInTime first)")
        ssp = sp.spacefes
        dyn = dyn or {}
        vec = dyn.get((id(gf), "vec"), gf._arr)
        el2dof = dyn.get((id(ssp), "el2dof"), ssp.el2dof)
        vdim = getattr(ssp, "vdim", 1)
        e2d = el2dof if elem_ids is None else el2dof[elem_ids]
        B = shapes(ssp.mesh.et, ssp.order, ref_pts)
        G = dshapes(ssp.mesh.et, ssp.order, ref_pts)
        Bt = sp.tfe.eval(jnp.broadcast_to(time, ref_pts.shape[:2]))  # (E,Q,nt)
        nscal = ssp.nscal if vdim > 1 else ssp.ndof
        vals, grads = [], []
        for c in range(vdim):
            v_c, g_c = 0.0, 0.0
            for t in range(sp.ndof_t):
                off = t * sp.ndof_s + (c * nscal if vdim > 1 else 0)
                dofs = vec[off + e2d]
                v_c = v_c + Bt[..., t] * jnp.einsum("eqi,ei->eq", B, dofs)
                g_c = g_c + Bt[..., t, None] * jnp.einsum(
                    "eqid,ei->eqd", G, dofs)
            vals.append(v_c)
            grads.append(g_c)
        return jnp.stack(vals, axis=-1), jnp.stack(grads, axis=-2)

    sp, el2dof, vec = _space_el2dof_and_vec(gf, dyn)
    vdim = getattr(sp, "vdim", 1)
    e2d = el2dof if elem_ids is None else el2dof[elem_ids]
    B = shapes(sp.mesh.et, sp.order, ref_pts)
    G = dshapes(sp.mesh.et, sp.order, ref_pts)  # (E,Q,ndl,d)
    vals, grads = [], []
    nscal = sp.nscal if vdim > 1 else sp.ndof
    for c in range(vdim):
        dofs = _gather_dofs(sp, vec, e2d, elem_ids,
                            offset=c * nscal if vdim > 1 else 0)
        vals.append(jnp.einsum("eqi,ei->eq", B, dofs))
        grads.append(jnp.einsum("eqid,ei->eqd", G, dofs))
    return jnp.stack(vals, axis=-1), jnp.stack(grads, axis=-2)


def grad(obj):
    """grad() for GridFunctions and proxies (NGSolve-style free function)."""
    if isinstance(obj, GridFunction):
        from ..spacetime.space import SpaceTimeFESpace

        if isinstance(obj.space, SpaceTimeFESpace):
            from ..spacetime.space import STGFValueCF

            return STGFValueCF(obj, grad=True)
        return GradGF(obj)
    g = getattr(obj, "grad_op", None)
    if g is not None:
        return g()
    raise TypeError(f"grad() not supported for {type(obj)}")


def InterpolateToP1(levelset, gf_p1: GridFunction, eps_perturbation=None):
    """Vertex interpolation of a level set into a P1 GridFunction
    (cf. utils/p1interpol.hpp:25-37).  The epsilon-guard against exact zeros
    is applied later inside the cut kernels (ops/straightcut.py:eps_guard)."""
    sp = gf_p1.space
    if not isinstance(sp, H1) or sp.order != 1:
        raise TypeError("InterpolateToP1 target must be an order-1 H1 GridFunction")
    gf_p1.Set(wrap(levelset))
