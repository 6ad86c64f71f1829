"""Ghost-penalty variants: facet-patch vs skeleton dn-jump stabilization,
plus exactness of the dn operator (exact polynomial directional derivative
vs the reference's FD stencils)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_fictdom_dn_ghostpen():
    from examples import fictdom_dn_ghostpen

    err = fictdom_dn_ghostpen.run(nx=20, order=1, verbose=False)
    assert err < 0.08, err


def test_fictdom_dn_ghostpen_order2():
    from examples import fictdom_dn_ghostpen

    err = fictdom_dn_ghostpen.run(nx=20, order=2, verbose=False)
    assert err < 0.02, err
