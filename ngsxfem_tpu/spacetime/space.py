"""Space-time tensor-product FE spaces, diff-ops and time-restriction utils.

Re-design of the reference space-time layer (``spacetime/SpaceTimeFESpace.*``,
``diffopDt.*``, ``timecf.*``, python bindings ``python_spacetime.cpp``):
the space is the tensor product (time-major dof blocks, cf.
SpaceTimeFESpace.cpp:109-122), basis evaluation is one outer product of the
time basis with the spatial basis at explicit time tensors — the reference's
weight-slot convention is gone.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import config
from ..cf.coefficient import CF, wrap
from ..fem.space import FESpace, BitArray
from ..fem.basis import shapes, dshapes
from ..forms.evaluate import Factor
from .timefe import ScalarTimeFE


class SpaceTimeFESpace:
    """V_space (x) P_k(time); ndof = ndof_space * ndof_time."""

    vdim = 1

    def __init__(self, spacefes: FESpace, timefe: ScalarTimeFE, dirichlet=None,
                 dgjumps=False, **kw):
        self.spacefes = spacefes
        self.tfe = timefe
        self.mesh = spacefes.mesh
        self.order = spacefes.order
        self.order_time = timefe.order
        self.ndof_t = timefe.ndof
        self.ndof_s = spacefes.ndof
        self.ndof = self.ndof_s * self.ndof_t
        maps = [spacefes.el2dof_np + t * self.ndof_s for t in range(self.ndof_t)]
        self.el2dof_np = np.concatenate(maps, axis=1).astype(np.int32)
        self.el2dof = jnp.asarray(self.el2dof_np)
        # own dirichlet spec (reference binding accepts one,
        # spacetime/python_spacetime.cpp:46-68) unions with the spatial one
        sdiri = spacefes.dirichlet_dofs
        if dirichlet is not None:
            sdiri = sdiri | spacefes._dirichlet_mask(dirichlet)
        self.dirichlet_dofs = np.tile(sdiri, self.ndof_t)
        self.bc_of_dof = np.tile(spacefes.bc_of_dof, self.ndof_t)
        self.dgjumps = dgjumps
        self._fixed_time = None
        self._override_time = False

    @property
    def k_t(self):
        return self.order_time

    def TimeFE_nodes(self):
        return list(self.tfe.nodes)

    def IsTimeNodeActive(self, i):
        return self.tfe.IsNodeActive(i)

    def SetTime(self, t):
        """Fix the time for subsequent GridFunction evaluations (reference
        SpaceTimeFESpace::SetTime); applies when no time context is present,
        or always if SetOverrideTime(True). Prefer fix_t/time contexts —
        changing the time here retraces affected jits."""
        self._fixed_time = None if t is None else float(t)

    def SetOverrideTime(self, override: bool):
        """Make SetTime's value override even integrator-supplied time
        (reference SpaceTimeFESpace::SetOverrideTime)."""
        self._override_time = bool(override)

    def FreeDofs(self, coupling=False):
        return BitArray(~self.dirichlet_dofs)

    def TrialFunction(self):
        from ..forms.proxies import make_proxies

        return make_proxies(self, test=False)

    def TestFunction(self):
        from ..forms.proxies import make_proxies

        return make_proxies(self, test=True)

    def TnT(self):
        return self.TrialFunction(), self.TestFunction()

    # -- proxy evaluation -----------------------------------------------------
    def _time_basis(self, proxy, pctx, deriv=False):
        if proxy.op_args and proxy.op.startswith("fix"):
            t = jnp.full((pctx.E, pctx.Q), float(proxy.op_args[0]),
                         dtype=pctx.ref_pts.dtype)
        else:
            if pctx.time is None:
                raise ValueError(
                    "space-time proxy evaluated without a time context; "
                    "use time_order>=0 integrals or fix_t"
                )
            t = jnp.broadcast_to(pctx.time, (pctx.E, pctx.Q))
        return self.tfe.deval(t) if deriv else self.tfe.eval(t)

    def proxy_factor_hook(self, proxy, ctx, pctx):
        et, ks = self.mesh.et, self.order
        op = proxy.op
        E, Q = pctx.E, pctx.Q
        if op in ("val", "fixt"):
            Bs = shapes(et, ks, pctx.ref_pts)
            Bt = self._time_basis(proxy, pctx)
            arr = jnp.einsum("eqt,eqi->eqti", Bt, Bs).reshape(E, Q, -1)
        elif op in ("grad", "fixtgrad"):
            G = dshapes(et, ks, pctx.ref_pts)
            Gp = jnp.einsum("eqid,eqdg->eqig", G, pctx.Jinv)
            Bt = self._time_basis(proxy, pctx)
            arr = jnp.einsum("eqt,eqig->eqtig", Bt, Gp).reshape(E, Q, -1,
                                                               self.mesh.dim)
        elif op in ("dt", "fixtdt"):
            Bs = shapes(et, ks, pctx.ref_pts)
            dBt = self._time_basis(proxy, pctx, deriv=True)
            arr = jnp.einsum("eqt,eqi->eqti", dBt, Bs).reshape(E, Q, -1)
        else:
            raise NotImplementedError(f"space-time proxy op {op}")
        return Factor(block=proxy.block_key, arr=arr, space=self)

    # -- GridFunction evaluation ----------------------------------------------
    def gf_eval_hook(self, gf, ctx, grad=False, deriv_t=False, fixed_time=None):
        vec = ctx.lookup(gf, "vec", gf._arr)
        ssp = self.spacefes
        vdim = getattr(ssp, "vdim", 1)
        if fixed_time is None and self._fixed_time is not None and (
                self._override_time or ctx.time is None):
            fixed_time = self._fixed_time  # SetTime / SetOverrideTime state
        if fixed_time is not None:
            t = jnp.full((ctx.E, ctx.Q), float(fixed_time), dtype=ctx.ref_pts.dtype)
        else:
            if ctx.time is None:
                raise ValueError("space-time GridFunction needs a time context"
                                 " (or SpaceTimeFESpace.SetTime)")
            t = jnp.broadcast_to(ctx.time, (ctx.E, ctx.Q))
        Bt = self.tfe.deval(t) if deriv_t else self.tfe.eval(t)  # (E,Q,ndt)
        if vdim == 1:
            e2d = ctx.lookup(self, "el2dof", self.el2dof)
            if ctx.elem_ids is not None:
                e2d = e2d[ctx.elem_ids]
            dofs = vec[e2d].reshape(ctx.E, self.ndof_t, -1)  # (E, ndt, ndl)
            if not grad:
                Bs = shapes(self.mesh.et, self.order, ctx.ref_pts)
                return jnp.einsum("eqt,eqi,eti->eq", Bt, Bs, dofs)
            G = dshapes(self.mesh.et, self.order, ctx.ref_pts)
            gref = jnp.einsum("eqt,eqid,eti->eqd", Bt, G, dofs)
            return jnp.einsum("eqd,eqdg->eqg", gref, ctx.Jinv)
        # vector spatial space (e.g. a space-time deformation): per component,
        # time block t's component c occupies [t*ndof_s + c*nscal, ...)
        e2d = ctx.lookup(ssp, "el2dof", ssp.el2dof)
        if ctx.elem_ids is not None:
            e2d = e2d[ctx.elem_ids]
        nscal = ssp.nscal
        toffs = jnp.arange(self.ndof_t) * self.ndof_s  # (ndt,)
        Bs = None if grad else shapes(self.mesh.et, self.order, ctx.ref_pts)
        G = dshapes(self.mesh.et, self.order, ctx.ref_pts) if grad else None
        outs = []
        for c in range(vdim):
            idx = toffs[None, :, None] + c * nscal + e2d[:, None, :]
            dofs = vec[idx]  # (E, ndt, ndl)
            if grad:
                gref = jnp.einsum("eqt,eqid,eti->eqd", Bt, G, dofs)
                outs.append(jnp.einsum("eqd,eqdg->eqg", gref, ctx.Jinv))
            else:
                outs.append(jnp.einsum("eqt,eqi,eti->eq", Bt, Bs, dofs))
        return jnp.stack(outs, axis=-2 if grad else -1)

    def RestrictGFInTime(self, spacetime_gf, reference_time, space_gf):
        bt = self.tfe.eval_np(np.array([reference_time]))[0]  # (ndt,)
        vec = spacetime_gf._arr.reshape(self.ndof_t, self.ndof_s)
        space_gf._set_array(jnp.einsum("t,ts->s", jnp.asarray(bt, vec.dtype), vec))

    def __repr__(self):
        return (f"SpaceTimeFESpace(ndof={self.ndof} = {self.ndof_s} x "
                f"{self.ndof_t}, k_t={self.k_t})")


# -- CF nodes ---------------------------------------------------------------


class TimeVariableCF(CF):
    """tref in [0,1] (cf. spacetime/timecf.hpp TimeVariableCoefficientFunction).

    ``FixTime``/``UnfixTime``/``IsFixed`` mirror the reference's mutable
    fixed-time state (spacetime/timecf.cpp:26-32): while fixed, the CF
    evaluates to the fixed value even outside a time context (used e.g. by
    per-time-node spatial interpolation, SpaceTimeFESpace.cpp:218-228)."""

    dims = ()

    def __init__(self):
        self._fixed_time = None

    def FixTime(self, time):
        self._fixed_time = float(time)

    def UnfixTime(self):
        self._fixed_time = None

    def IsFixed(self):
        return self._fixed_time is not None

    def _eval_pure(self, ctx):
        if self._fixed_time is not None:
            return jnp.full((ctx.E, ctx.Q), self._fixed_time,
                            dtype=ctx.ref_pts.dtype)
        if ctx.time is None:
            raise ValueError("ReferenceTimeVariable evaluated without time context")
        return jnp.broadcast_to(ctx.time, (ctx.E, ctx.Q))

    def _signature(self, slots):
        if self._fixed_time is not None:
            return ("tref_fixed", self._fixed_time)
        return ("tref",)


def ReferenceTimeVariable():
    return TimeVariableCF()


tref = TimeVariableCF()


class TimeFixedCF(CF):
    """Evaluate a (time-dependent) CF at a fixed reference time."""

    def __init__(self, child, t):
        self.child = wrap(child)
        self.t = float(t)
        self.dims = self.child.dims

    def children(self):
        return (self.child,)

    def _signature(self, slots):
        from ..jitcache import cf_signature

        return ("tfix", self.t, cf_signature(self.child, slots))

    def _eval_pure(self, ctx):
        from ..cf.context import EvalCtx, eval_pure

        sub = EvalCtx(ctx.mesh, ctx.ref_pts, elem_ids=ctx.elem_ids,
                      nref=ctx._nref, normal=ctx._normal,
                      facet_ids=ctx.facet_ids, dyn=ctx.dyn,
                      deformation=ctx.deformation,  # keep per-integral override
                      time=jnp.full((ctx.E, ctx.Q), self.t,
                                    dtype=ctx.ref_pts.dtype))
        return eval_pure(self.child, sub)


class STGFValueCF(CF):
    """Value / spatial-grad / dt of a space-time GridFunction."""

    def __init__(self, gf, grad=False, deriv_t=False, fixed_time=None):
        self.gf = gf
        self.grad = grad
        self.deriv_t = deriv_t
        self.fixed_time = fixed_time
        vdim = getattr(gf.space.spacefes, "vdim", 1)
        d = gf.space.mesh.dim
        if grad:
            self.dims = (d,) if vdim == 1 else (vdim, d)
        else:
            self.dims = () if vdim == 1 else (vdim,)

    def _signature(self, slots):
        from ..jitcache import obj_uid, register_space

        s = slots.slot(self.gf, "vec", lambda g=self.gf: g._arr)
        register_space(self.gf.space, slots)
        sp = self.gf.space
        return ("stgf", obj_uid(sp), self.grad, self.deriv_t,
                self.fixed_time, sp._fixed_time, sp._override_time, s)

    def _eval_pure(self, ctx):
        return self.gf.space.gf_eval_hook(
            self.gf, ctx, grad=self.grad, deriv_t=self.deriv_t,
            fixed_time=self.fixed_time,
        )


def dt(u):
    """Time derivative w.r.t. tref (reference diffopDt.hpp DiffOpDt)."""
    from ..forms.proxies import ProxyFunction
    from ..fem.gridfunction import GridFunction

    if isinstance(u, ProxyFunction):
        if not isinstance(u.space, SpaceTimeFESpace):
            raise TypeError("dt needs a space-time function")
        if u.op != "val":
            # dt(grad(u)) / dt(dt(u)) etc. have no diff-op here (nor in the
            # reference, diffopDt.hpp applies to the value) — raising beats
            # silently discarding the inner operator
            raise NotImplementedError(
                f"dt of a '{u.op}' proxy is not supported; apply dt to the "
                "plain function")
        return u._clone(op="dt", dims=())
    if isinstance(u, GridFunction) and isinstance(u.space, SpaceTimeFESpace):
        return STGFValueCF(u, deriv_t=True)
    raise TypeError("dt expects a space-time proxy or GridFunction")


def dt_vec(u):
    """Vector variant of dt (reference DiffOpDtVec): componentwise time
    derivative — identical to dt in the tensor-product construction here."""
    return dt(u)


def fix_t(u, time):
    """Trace at fixed reference time (reference DiffOpFixt / fix_t)."""
    from ..forms.proxies import ProxyFunction
    from ..fem.gridfunction import GridFunction

    if isinstance(u, ProxyFunction):
        if not isinstance(u.space, SpaceTimeFESpace):
            raise TypeError("fix_t needs a space-time function")
        op = {"grad": "fixtgrad", "val": "fixt", "dt": "fixtdt"}.get(u.op)
        if op is None:
            raise NotImplementedError(
                f"fix_t of a '{u.op}' proxy is not supported")
        return u._clone(op=op, op_args=(float(time),))
    if isinstance(u, GridFunction) and isinstance(u.space, SpaceTimeFESpace):
        return STGFValueCF(u, fixed_time=float(time))
    if isinstance(u, CF):
        return TimeFixedCF(u, time)
    raise TypeError("fix_t expects a space-time function or CF")


def CreateTimeRestrictedGF(gf_st, reference_time=0.0):
    from ..fem.gridfunction import GridFunction

    sp = gf_st.space
    out = GridFunction(sp.spacefes, name=f"{gf_st.name}@t={reference_time}")
    sp.RestrictGFInTime(gf_st, reference_time, out)
    return out


def RestrictGFInTime(spacetime_gf=None, reference_time=0.0, space_gf=None):
    spacetime_gf.space.RestrictGFInTime(spacetime_gf, reference_time, space_gf)


def SpaceTimeInterpolateToP1(levelset, tref_var, gf_st):
    """Interpolate a time-dependent level set into a space-time P1 GF
    (cf. SpaceTimeFESpace::InterpolateToP1, SpaceTimeFESpace.cpp:202-230)."""
    sp = gf_st.space
    if not isinstance(sp, SpaceTimeFESpace) or sp.spacefes.order != 1:
        raise TypeError("target must be a space-time GF over H1(order=1)")
    from ..fem.gridfunction import GridFunction

    blocks = []
    tmp = GridFunction(sp.spacefes)
    for tn in sp.tfe.nodes:
        tmp.Set(TimeFixedCF(levelset, float(tn)))
        blocks.append(tmp._arr)
    gf_st._set_array(jnp.concatenate(blocks))
