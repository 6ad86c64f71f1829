"""Quadrature-point evaluation context and pure-CF evaluator.

The context carries batched geometry tensors for a set of elements and
reference points — the TPU analog of NGSolve's ``MappedIntegrationRule`` that
the reference evaluates coefficients on (``cutint/python_cutint.cpp:57-64``).
Everything is lazy so unused geometry (e.g. normals) costs nothing under jit.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..mesh.mesh import map_points, det_and_inv
from . import coefficient as C


class EvalCtx:
    def __init__(self, mesh, ref_pts, elem_ids=None, nref=None, normal=None,
                 facet_ids=None, proxy_values=None, time=None, dyn=None,
                 deformation="inherit"):
        self.mesh = mesh
        # per-integral deformation override (the reference integrators accept
        # a `deformation` kwarg, xfem/python_xfem.cpp:512-513); "inherit"
        # means the mesh-level SetDeformation state
        self.deformation = (mesh.deformation if deformation == "inherit"
                            else deformation)
        self.ref_pts = ref_pts  # (E,Q,d)
        self.elem_ids = elem_ids  # (E,) or None == all elements
        self._nref = nref  # (E,Q,d) reference-space unit normal (cut IF rules)
        self._normal = normal  # (E,Q,d) physical unit normal (facet rules)
        self.facet_ids = facet_ids  # (E,) facet index per row (facet loops)
        self.proxy_values = proxy_values or {}
        self.time = time  # scalar/array in [0,1] for space-time (later)
        # dynamic-array environment: id(holder) -> traced array (jitcache.py)
        self.dyn = dyn or {}
        self._cache = {}
        self.E, self.Q = ref_pts.shape[0], ref_pts.shape[1]

    def lookup(self, holder, attr, value):
        """Fetch the traced array for a dynamic holder (falls back to value)."""
        return self.dyn.get((id(holder), attr), value)

    # -- geometry -----------------------------------------------------------
    @property
    def elem_coords(self):
        if "elem_coords" not in self._cache:
            els = self.lookup(self.mesh, "elements", self.mesh.elements)
            if self.elem_ids is not None:
                els = els[self.elem_ids]
            verts = self.lookup(self.mesh, "vertices", self.mesh.vertices)
            self._cache["elem_coords"] = verts[els]
        return self._cache["elem_coords"]

    def _geometry(self):
        if "phys" not in self._cache:
            phys, J = map_points(self.mesh.et, self.elem_coords, self.ref_pts)
            if self.deformation is not None:
                from ..fem.gridfunction import gf_ref_value_and_grad

                disp, dgrad = gf_ref_value_and_grad(
                    self.deformation, self.elem_ids, self.ref_pts,
                    dyn=self.dyn, time=self.time
                )
                phys = phys + disp
                J = J + dgrad
            self._cache["phys"] = phys
            self._cache["J"] = J
        return self._cache["phys"], self._cache["J"]

    @property
    def phys(self):
        return self._geometry()[0]

    @property
    def J(self):
        return self._geometry()[1]

    @property
    def detJ(self):
        if "detJ" not in self._cache:
            detJ, Jinv = det_and_inv(self.J)
            self._cache["detJ"], self._cache["Jinv"] = detJ, Jinv
        return self._cache["detJ"]

    @property
    def Jinv(self):
        self.detJ
        return self._cache["Jinv"]

    @property
    def absdetJ(self):
        return jnp.abs(self.detJ)

    @property
    def h(self):
        """NGSolve-like mesh size |det J|^(1/dim)."""
        return self.absdetJ ** (1.0 / self.mesh.dim)

    def _jinvt_nref(self):
        """J^-T n_ref and its norm, shared by `normal` and `if_scale`."""
        if "jinvt_nref" not in self._cache:
            n = jnp.einsum("eqdg,eqd->eqg", self.Jinv, self._nref)
            self._cache["jinvt_nref"] = (n, jnp.linalg.norm(n, axis=-1))
        return self._cache["jinvt_nref"]

    @property
    def normal(self):
        if self._normal is not None:
            return self._normal
        if self._nref is not None:
            if "normal" not in self._cache:
                n, nn = self._jinvt_nref()
                nn = nn[..., None]
                self._cache["normal"] = n / jnp.where(nn < 1e-30, 1.0, nn)
            return self._cache["normal"]
        raise ValueError("no normal available in this context")

    @property
    def if_scale(self):
        """co-area weight factor ||J^-T n_ref|| (interface rules)."""
        if self._nref is None:
            raise ValueError("if_scale needs a reference normal")
        return self._jinvt_nref()[1]


def eval_pure(cf, ctx: EvalCtx):
    """Evaluate a proxy-free CF -> array broadcastable to (E,Q)+cf.dims."""
    if isinstance(cf, C.Constant):
        return jnp.asarray(cf.value, dtype=ctx.ref_pts.dtype)
    if isinstance(cf, C.Parameter):
        return ctx.lookup(cf, "value", jnp.asarray(cf.value, dtype=ctx.ref_pts.dtype))
    if isinstance(cf, C.Coord):
        if cf.axis >= ctx.mesh.dim:
            return jnp.zeros((), dtype=ctx.ref_pts.dtype)
        return ctx.phys[..., cf.axis]
    if isinstance(cf, C.Add):
        a, b = eval_pure(cf.a, ctx), eval_pure(cf.b, ctx)
        return a + b
    if isinstance(cf, C.Scale):
        return cf.s * eval_pure(cf.a, ctx)
    if isinstance(cf, C.Mul):
        a, b = eval_pure(cf.a, ctx), eval_pure(cf.b, ctx)
        if cf.a.dims == () and cf.b.dims != ():
            s = _bc(a, ctx).reshape((ctx.E, ctx.Q) + (1,) * len(cf.b.dims))
            return s * _full(b, ctx, cf.b.dims)
        if cf.b.dims == () and cf.a.dims != ():
            s = _bc(b, ctx).reshape((ctx.E, ctx.Q) + (1,) * len(cf.a.dims))
            return _full(a, ctx, cf.a.dims) * s
        return a * b
    if isinstance(cf, C.InnerProduct):
        a, b = eval_pure(cf.a, ctx), eval_pure(cf.b, ctx)
        if cf.a.dims == ():  # scalar InnerProduct == product
            return a * b
        # contract over ALL component axes (Frobenius for matrices)
        axes = tuple(range(-len(cf.a.dims), 0))
        return jnp.sum(_full(a, ctx, cf.a.dims) * _full(b, ctx, cf.b.dims),
                       axis=axes)
    if isinstance(cf, C.MatVec):
        a, b = _full(eval_pure(cf.a, ctx), ctx, cf.a.dims), _full(
            eval_pure(cf.b, ctx), ctx, cf.b.dims
        )
        return jnp.einsum("...ij,...j->...i", a, b)
    if isinstance(cf, C.Div):
        return eval_pure(cf.a, ctx) / eval_pure(cf.b, ctx)
    if isinstance(cf, C.Pow):
        return eval_pure(cf.a, ctx) ** cf.p
    if isinstance(cf, C.UnaryOp):
        return C.UnaryOp.FNS[cf.fname](eval_pure(cf.a, ctx))
    if isinstance(cf, C.Component):
        a = _full(eval_pure(cf.a, ctx), ctx, cf.a.dims)
        return a[..., cf.idx] if len(cf.a.dims) == 1 else a[..., cf.idx, :]
    if isinstance(cf, C.VectorCF):
        cols = []
        for c in cf.comps:
            v = _full(eval_pure(c, ctx), ctx, c.dims)
            if c.dims == ():
                cols.append(v[..., None])
            else:
                cols.append(v)
        return jnp.concatenate(cols, axis=-1)
    if isinstance(cf, C.Reshaped):
        a = _full(eval_pure(cf.child, ctx), ctx, cf.child.dims)
        return a.reshape(a.shape[: a.ndim - len(cf.child.dims)] + cf.dims)
    if isinstance(cf, C.NormCF):
        a = _full(eval_pure(cf.a, ctx), ctx, cf.a.dims)
        if cf.a.dims == ():
            return jnp.abs(a)
        # Frobenius norm over ALL component axes (vector or matrix)
        axes = tuple(range(-len(cf.a.dims), 0))
        return jnp.sqrt(jnp.sum(a * a, axis=axes))
    if isinstance(cf, C.IfPosCF):
        c = _bc(eval_pure(cf.c, ctx), ctx)
        a = _full(eval_pure(cf.a, ctx), ctx, cf.a.dims)
        b = _full(eval_pure(cf.b, ctx), ctx, cf.b.dims)
        if cf.dims != ():
            c = c[..., None]
        return jnp.where(c > 0, a, b)
    if isinstance(cf, C.SpecialCF):
        if cf.kind == "mesh_size":
            return ctx.h
        if cf.kind == "normal":
            return ctx.normal
        raise NotImplementedError(f"specialcf.{cf.kind}")
    if isinstance(cf, C.ElementValuesCF):
        v = ctx.lookup(cf, "values", cf.values)
        if ctx.elem_ids is not None:
            v = v[ctx.elem_ids]
        return v[:, None].astype(ctx.ref_pts.dtype)
    if isinstance(cf, C.FacetValuesCF):
        if ctx.facet_ids is None:
            raise ValueError("facet-valued CF evaluated outside a facet loop")
        v = ctx.lookup(cf, "values", cf.values)
        return v[ctx.facet_ids][:, None].astype(ctx.ref_pts.dtype)
    # GridFunction and proxy evaluation are handled by subclass hooks:
    ev = getattr(cf, "_eval_pure", None)
    if ev is not None:
        return ev(ctx)
    raise NotImplementedError(f"cannot evaluate {type(cf).__name__}")


def _bc(a, ctx):
    """broadcast scalar-ish array to (E,Q)."""
    E, Q = ctx.ref_pts.shape[:2]
    return jnp.broadcast_to(a, (E, Q))


def _full(a, ctx, dims):
    E, Q = ctx.ref_pts.shape[:2]
    return jnp.broadcast_to(a, (E, Q) + dims)
