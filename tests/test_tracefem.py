"""TraceFEM surface Laplace-Beltrami (port of py_tutorials/tracefem3d.py /
traceconverg.py): manufactured solution on the unit sphere, L2 accuracy."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples import tracefem3d


def test_tracefem3d():
    err = tracefem3d.run(nx=6, order=2, verbose=False)
    assert err < 0.06, err


def test_tracefem3d_converges():
    e1 = tracefem3d.run(nx=6, order=2, verbose=False)
    e2 = tracefem3d.run(nx=12, order=2, verbose=False)
    assert e2 < e1 / 6, (e1, e2)


def test_tracefem2d_eoc():
    """2D traceconverg port (py_tutorials/traceconverg.py): optimal L2(Gamma)
    convergence of the surface PDE u - lap_Gamma(u) = 2(x+y)."""
    from examples import tracefem

    errs, eocs = tracefem.converg(order=1, levels=3, nx0=8, verbose=False)
    assert sum(eocs) / len(eocs) > 1.75, (errs, eocs)

    errs2, eocs2 = tracefem.converg(order=2, levels=3, nx0=8, verbose=False)
    assert sum(eocs2) / len(eocs2) > 2.7, (errs2, eocs2)
    assert errs2[-1] < 1e-4


def test_tracefem_hdg_eoc():
    """HDG TraceFEM port (reference test_straightcutrule.py:283-430): L2+
    facet hybrid spaces, codim-2 element-boundary cut integrals, restricted
    sparsity; optimal L2(Gamma) convergence for k=1,2."""
    import math

    from examples import tracefem_hdg

    e1 = [tracefem_hdg.run(nx, order=1, verbose=False) for nx in (8, 16)]
    assert math.log(e1[0] / e1[1]) / math.log(2) > 1.75, e1
    e2 = [tracefem_hdg.run(nx, order=2, verbose=False) for nx in (8, 16)]
    assert math.log(e2[0] / e2[1]) / math.log(2) > 2.6, e2
    assert e2[1] < 3e-4, e2
    # static condensation of the bulk block reproduces the direct solve
    ec = tracefem_hdg.run(12, order=1, verbose=False, condense=True)
    ed = tracefem_hdg.run(12, order=1, verbose=False)
    assert abs(ec - ed) < 1e-8, (ec, ed)
