"""shifted_eval: evaluate a GridFunction through a deformation composition.

Re-design of the reference ``DiffOpShiftedEval``
(``lsetcurving/shiftedevaluate.hpp:13-70``): value of gf at
s(x) = psi_back^{-1}(psi_forth(x)), where psi_* = id + d_* are mesh
deformations.  Used to transfer solutions between differently-deformed meshes
(space-time time stepping across slabs).  The point inversion is a batched
fixed-iteration Newton within the element (polynomial basis extension), like
the reference's same-element search (shiftedevaluate.cpp:68-95).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..cf.coefficient import CF
from ..mesh.mesh import map_points, det_and_inv
from ..fem.gridfunction import GridFunction, gf_ref_value_and_grad, gf_value


class ShiftedEvalCF(CF):
    def __init__(self, gf: GridFunction, back=None, forth=None, niter=6):
        self.gf = gf
        self.back = back  # deformation GF (psi_back - id) or None
        self.forth = forth
        self.niter = niter
        vd = getattr(gf.space, "vdim", 1)
        self.dims = () if vd == 1 else (vd,)

    def children(self):
        return (self.gf,)

    def _signature(self, slots):
        from ..jitcache import obj_uid, register_space

        s = slots.slot(self.gf, "vec", lambda g=self.gf: g._arr)
        register_space(self.gf.space, slots)
        parts = ["sheval", obj_uid(self.gf.space), s]
        for tag, d in (("b", self.back), ("f", self.forth)):
            if d is not None:
                sd = slots.slot(d, "vec", lambda g=d: g._arr)
                register_space(d.space, slots)
                parts += [tag, obj_uid(d.space), sd]
        return tuple(parts)

    def _eval_pure(self, ctx):
        mesh = ctx.mesh
        et = mesh.et
        xhat = ctx.ref_pts  # (E,Q,d)
        coords = ctx.elem_coords

        def disp(defgf, pts):
            if defgf is None:
                return 0.0, 0.0
            val, gref = gf_ref_value_and_grad(defgf, ctx.elem_ids, pts, dyn=ctx.dyn)
            return val, gref

        # target physical point: vertex map + forth displacement at xhat
        phys_x, _ = map_points(et, coords, xhat)
        dfo, _ = disp(self.forth, xhat)
        target = phys_x + (dfo if self.forth is not None else 0.0)

        yhat = xhat
        for _ in range(self.niter):
            py, Jy = map_points(et, coords, yhat)
            db, gb = disp(self.back, yhat)
            if self.back is not None:
                py = py + db
                Jy = Jy + gb
            _, Jinv = det_and_inv(Jy)
            yhat = yhat + jnp.einsum("eqg,eqdg->eqd", target - py, Jinv)

        # convergence check + fallback (reference DiffOpShiftedEval warns on
        # a non-converged point search, shiftedevaluate.cpp:68-95): points
        # where the fixed-iteration Newton did not reach tolerance revert to
        # the unshifted reference point — bounded O(deformation) error
        # instead of evaluating at a garbage location.
        py, Jy = map_points(et, coords, yhat)
        db, _ = disp(self.back, yhat)
        if self.back is not None:
            py = py + db
        err = jnp.linalg.norm(target - py, axis=-1)
        detJ, _ = det_and_inv(Jy)
        h = jnp.abs(detJ) ** (1.0 / xhat.shape[-1])
        tol = 1e4 * jnp.finfo(yhat.dtype).eps * jnp.maximum(h, 1e-30)
        conv = err <= tol
        from ..config import config as _cfg

        if _cfg.newton_debug:
            from ..utils.diagnostics import emit_nonconverged

            emit_nonconverged("shifted_eval Newton",
                              "the unshifted point",
                              jnp.sum(~conv), conv.size)
        yhat = jnp.where(conv[..., None], yhat, xhat)

        from ..cf.context import EvalCtx

        sub = EvalCtx(mesh, yhat, elem_ids=ctx.elem_ids, dyn=ctx.dyn,
                      time=ctx.time)
        hook = getattr(self.gf.space, "gf_eval_hook", None)
        if hook is not None:
            return hook(self.gf, sub)
        return gf_value(self.gf, ctx.elem_ids, yhat, sub)


def shifted_eval(gf, back=None, forth=None):
    """Evaluate gf at psi_back^{-1}(psi_forth(x)) (reference shifted_eval,
    lsetcurving/python_lsetcurving.cpp:243-321)."""
    return ShiftedEvalCF(gf, back=back, forth=forth)
