"""API demo: unfitted FE space features (port of py_tutorials/xfespaces.py).

Shows CutInfo queries, XFESpace dof bookkeeping, enrichment operators, the
cut-ratio CF, and restricted/compressed spaces.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ngsxfem_tpu import *


def run(verbose=True):
    mesh = MakeStructured2DMesh(quads=False, nx=10, ny=10)
    levelset = sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2) - 0.3
    lsetp1 = GridFunction(H1(mesh, order=1))
    InterpolateToP1(levelset, lsetp1)

    ci = CutInfo(mesh, lsetp1)
    if verbose:
        for dom in [NEG, POS, IF, HASNEG, HASPOS, ANY]:
            print(f"elements of type {dom!s:18}:",
                  ci.GetElementsOfType(dom).NumSet())
        print("mean cut ratio on IF elements:",
              float(np.mean(ci.GetCutRatios()[ci.GetElementsOfType(IF).np])))

    Vh = H1(mesh, order=2)
    Vhx = XFESpace(Vh, lsetp1)
    if verbose:
        print("base ndof:", Vh.ndof, " enrichment ndof:", Vhx.ndof)

    gfx = GridFunction(Vhx)
    gfx.vec = np.ones(Vhx.ndof)
    # neg/pos parts and two-field conversion
    VhG = FESpace([Vh, Vh])
    gf2 = GridFunction(VhG)
    XToNegPos(gfx, gf2)
    i_neg = Integrate({"levelset": lsetp1, "domain_type": NEG}, neg(gfx), mesh, order=2)
    i_pos = Integrate({"levelset": lsetp1, "domain_type": POS}, pos(gfx), mesh, order=2)
    if verbose:
        print("int_NEG neg(u_x):", i_neg, " int_POS pos(u_x):", i_pos)

    # compressed space on the active band
    act = GetDofsOfElements(Vh, ci.GetElementsOfType(HASNEG))
    Vc = Compress(Vh, act)
    if verbose:
        print("compressed ndof:", Vc.ndof, "of", Vh.ndof)
    return Vhx.ndof, Vc.ndof


if __name__ == "__main__":
    run()
