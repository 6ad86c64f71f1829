"""Space-time cut-rule and moving-domain tests (port of the reference
tests/pytests/test_spacetimecutrule.py patterns: exact space-time volumes,
moving-geometry EOC, slab-coupled heat solve)."""
import os
import sys

from math import pi, log as mlog

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngsxfem_tpu import (
    NEG, POS, IF, H1, CoefficientFunction, GridFunction, Integrate,
    Make1DMesh, MakeStructured2DMesh, ScalarTimeFE, SpaceTimeFESpace,
    SpaceTimeInterpolateToP1, sqrt, tref, x, y,
)


@pytest.mark.parametrize("dom,expect", [(NEG, 0.5), (POS, 0.5), (IF, 1.0)])
def test_st_exact_1d(dom, expect):
    mesh = Make1DMesh(5)
    st = SpaceTimeFESpace(H1(mesh, order=1), ScalarTimeFE(1))
    lset = GridFunction(st)
    SpaceTimeInterpolateToP1(x - 0.3 - 0.4 * tref, tref, lset)
    v = Integrate({"levelset": lset, "domain_type": dom},
                  CoefficientFunction(1.0), mesh, order=3, time_order=2)
    assert abs(v - expect) < 1e-13


def test_st_exact_quadratic_time():
    mesh = Make1DMesh(4)
    st = SpaceTimeFESpace(H1(mesh, order=1), ScalarTimeFE(2))
    lset = GridFunction(st)
    SpaceTimeInterpolateToP1(x - 0.3 - 0.2 * tref * tref, tref, lset)
    v = Integrate({"levelset": lset, "domain_type": NEG},
                  CoefficientFunction(1.0), mesh, order=3, time_order=4)
    assert abs(v - (0.3 + 0.2 / 3)) < 1e-13


def test_st_moving_circle_eoc():
    r = 0.5
    errs = []
    for i in range(2):
        nx, nslab = 8 * 2**i, 2 * 2**i
        mesh = MakeStructured2DMesh(
            quads=False, nx=nx, ny=nx, mapping=lambda a, b: (2 * a - 1, 2 * b - 1)
        )
        st = SpaceTimeFESpace(H1(mesh, order=1), ScalarTimeFE(1))
        lset = GridFunction(st)
        tot = 0.0
        for s in range(nslab):
            t0, dts = s / nslab, 1.0 / nslab
            lev = sqrt((x - 0.2 * (t0 + dts * tref) + 0.1) ** 2 + y * y) - r
            SpaceTimeInterpolateToP1(lev, tref, lset)
            tot += dts * Integrate(
                {"levelset": lset, "domain_type": NEG},
                CoefficientFunction(1.0), mesh, order=2, time_order=2,
            )
        errs.append(abs(tot - pi * r * r))
    eoc = mlog(errs[0] / errs[1]) / mlog(2)
    assert eoc > 1.7, (errs, eoc)


def test_moving_domain_heat():
    from examples import moving_domain

    e1 = moving_domain.run(nx=12, nslab=4, verbose=False)
    e2 = moving_domain.run(nx=24, nslab=8, verbose=False)
    assert e2 < e1 / 2, (e1, e2)
