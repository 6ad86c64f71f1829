"""TraceFEM convergence study on a 2D interface (circle).

Port of the reference tutorial ``py_tutorials/traceconverg.py``: the
surface-PDE discretization lives in ``examples/tracefem.py``; this driver
runs its EOC study and prints the convergence table (the tutorial's whole
purpose), cf. ``tests/test_tracefem.py::test_tracefem2d_eoc``.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tracefem import converg  # noqa: E402  (sibling example module)

if __name__ == "__main__":
    for order in (1, 2):
        errs, eocs = converg(order=order, levels=3, verbose=False)
        print(f"order {order}: errors {['%.3e' % e for e in errs]} "
              f"eocs {['%.2f' % e for e in eocs]}")
