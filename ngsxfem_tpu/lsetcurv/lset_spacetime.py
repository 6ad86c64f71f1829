"""Space-time isoparametric level-set mesh adaptation.

Counterpart of the reference ``spacetime/lset_spacetime.py:12-256``
(LevelSetMeshAdaptation_Spacetime): per time node of the slab's temporal FE,
the time-dependent level set is interpolated to high order and to P1 and a
spatial shift (ProjectShift) is computed; the per-node results are stacked
into space-time GridFunctions (lset_ho, lset_p1, deform).  The deformation is
a space-time GF — spatial integrals under ``mesh.SetDeformation`` evaluate it
at each quadrature point's time (fem/gridfunction.py gf_ref_value_and_grad).

Time dependence is expressed through ``tref`` (the slab-reference time CF) —
the slab driver composes absolute time as ``t_start + dt * tref`` — instead of
the reference's Parameter.FixTime mechanism.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import config
from ..fem.space import H1, BitArray
from ..fem.gridfunction import GridFunction, InterpolateToP1
from ..domaintype import NEG, POS, IF
from .lsetcurv import LevelSetMeshAdaptation


class LevelSetMeshAdaptation_Spacetime:
    """Space-time deformation driver (cf. spacetime/lset_spacetime.py)."""

    def __init__(self, mesh, order_space=2, order_time=1, lset_lower_bound=0,
                 lset_upper_bound=0, threshold=-1, discontinuous_qn=True,
                 heapsize=None, periodic=False):
        from ..spacetime.space import SpaceTimeFESpace
        from ..spacetime.timefe import ScalarTimeFE

        self.mesh = mesh
        self.order_space = order_space
        self.order_time = order_time
        self.threshold = threshold
        # nodal machinery (high-order space, P1 space, deform space + kernel)
        self.nodal = LevelSetMeshAdaptation(
            mesh, order=order_space, threshold=threshold,
            discontinuous_qn=discontinuous_qn, periodic=periodic)
        self.tfe = ScalarTimeFE(order_time)
        self.v_ho_st = SpaceTimeFESpace(self.nodal.ho_space, self.tfe)
        self.v_p1_st = SpaceTimeFESpace(self.nodal.p1_space, self.tfe)
        self.v_def_st = SpaceTimeFESpace(self.nodal.deform_space, self.tfe)
        self.lset_ho = GridFunction(self.v_ho_st, "lset_ho_st")
        self.lset_p1 = GridFunction(self.v_p1_st, "lset_p1_st")
        self.deform = GridFunction(self.v_def_st, "deform_st")
        self.levelset = None
        ne = mesh.ne
        self.hasneg_spacetime = BitArray(np.zeros(ne, dtype=bool))
        self.haspos_spacetime = BitArray(np.zeros(ne, dtype=bool))
        self.hasif_spacetime = BitArray(np.zeros(ne, dtype=bool))

    @property
    def lset_p1_node(self):
        return self.nodal.lset_p1

    def interpol_ho(self, levelset):
        """High-order spatial interpolation at every time node
        (reference lset_spacetime.py:84-94)."""
        from ..spacetime.space import TimeFixedCF

        blocks = []
        for tn in self.tfe.nodes:
            self.nodal.lset_ho.Set(TimeFixedCF(levelset, float(tn)))
            blocks.append(self.nodal.lset_ho._arr)
        self.lset_ho._set_array(jnp.concatenate(blocks))

    def interpol_p1(self):
        """Per-node P1 vertex interpolation (reference lset_spacetime.py:96-100)."""
        nds = self.nodal.ho_space.ndof
        blocks = []
        for i in range(self.tfe.ndof):
            self.nodal.lset_ho._set_array(
                self.lset_ho._arr[i * nds:(i + 1) * nds])
            InterpolateToP1(self.nodal.lset_ho, self.nodal.lset_p1)
            blocks.append(self.nodal.lset_p1._arr)
        self.lset_p1._set_array(jnp.concatenate(blocks))

    def CalcDeformation(self, levelset, tstart=None, dt=None, calc_kappa=False):
        """Compute the space-time deformation for one slab.

        `levelset` is a CF in `tref` (slab-local time); pass the absolute-time
        composition yourself (t_start + dt * tref) as in examples/moving_domain.
        """
        from ..geom.cutinfo import CutInfo

        self.levelset = levelset
        self.interpol_ho(levelset)
        self.interpol_p1()

        # space-time cut classification over the slab
        ci = CutInfo(self.mesh, self.lset_p1, time_order=self.order_time)
        self.ci = ci
        self.hasneg_spacetime = ci.GetElementsOfType(NEG) | ci.GetElementsOfType(IF)
        self.haspos_spacetime = ci.GetElementsOfType(POS) | ci.GetElementsOfType(IF)
        self.hasif_spacetime = ci.GetElementsOfType(IF)
        band = self.hasif_spacetime.np

        nds = self.nodal.ho_space.ndof
        ndp = self.nodal.p1_space.ndof
        blocks = []
        for i, tn in enumerate(self.tfe.nodes):
            self.nodal.lset_ho._set_array(
                self.lset_ho._arr[i * nds:(i + 1) * nds])
            self.nodal.lset_p1._set_array(
                self.lset_p1._arr[i * ndp:(i + 1) * ndp])
            self.nodal._shift_from_nodal(
                self.nodal.lset_ho, self.nodal.lset_p1, self.nodal.deform,
                band=band)
            blocks.append(self.nodal.deform._arr)
        self.deform._set_array(jnp.concatenate(blocks))
        return self.deform

    def CalcMaxDistance(self, levelset=None, given_pts=None, heapsize=None):
        """max over sampled times of the nodal geometric distance estimate
        (reference lset_spacetime.py CalcMaxDistance)."""
        from ..spacetime.space import RestrictGFInTime, TimeFixedCF

        levelset = levelset if levelset is not None else self.levelset
        times = list(given_pts) if given_pts else list(self.tfe.nodes)
        deform_node = GridFunction(self.nodal.deform_space)
        lset_p1_node = GridFunction(self.nodal.p1_space)
        dists = []
        for t in times:
            RestrictGFInTime(self.lset_p1, float(t), lset_p1_node)
            RestrictGFInTime(self.deform, float(t), deform_node)
            self.nodal.lset_p1._set_array(lset_p1_node._arr)
            dists.append(self.nodal.CalcMaxDistance(
                TimeFixedCF(levelset, float(t)), deform=deform_node))
        return max(dists)
