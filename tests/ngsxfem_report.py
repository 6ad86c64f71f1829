"""Timing report harness (analog of reference tests/ngsxfem_report.py:11-80).

Measures space-construction / update wall times for standard H1 vs XFESpace
across dimensions and orders, and appends one line per case to
``fes_timings`` in the output directory:

    python tests/ngsxfem_report.py [basedir] [run_id]

Not collected by pytest (no test_ prefix); run manually like the reference.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngsxfem_tpu import (CutInfo, GridFunction, H1, InterpolateToP1,
                         MakeStructured2DMesh, MakeStructured3DMesh,
                         ngsglobals, sqrt, x, y)
from ngsxfem_tpu.fem.xfespace import XFESpace
from ngsxfem_tpu.utils.timing import Timer, PrintTimers

ngsglobals.msg_level = 1


def test_fes_timing(dimension=2, stdfes=True, order=1, steps=5):
    if dimension == 2:
        mesh = MakeStructured2DMesh(quads=False, nx=5, ny=5)
    else:
        mesh = MakeStructured3DMesh(hexes=False, nx=5, ny=5, nz=5)

    lsetp1 = GridFunction(H1(mesh, order=1))
    InterpolateToP1(sqrt(sqrt(x * x + y * y)) - 1.0, lsetp1)

    name = f"{'std' if stdfes else 'x'}fes_d{dimension}_k{order}"
    t0 = time.perf_counter()
    for _ in range(steps):
        with Timer(name):
            Vhs = H1(mesh, order=order, dirichlet=[1, 2, 3, 4])
            if not stdfes:
                XFESpace(Vhs, CutInfo(mesh, lsetp1))
    te = time.perf_counter()
    return name, 1e9 * (te - t0) / steps


if __name__ == "__main__":
    basedir = sys.argv[1] if len(sys.argv) > 1 else "./"
    run_id = sys.argv[2] if len(sys.argv) > 2 else "0000"
    date = time.strftime("%Y/%m/%d %H:%M:%S")

    cases = [(d, std, order) for d in (2, 3) for std in (True, False)
             for order in (1, 3)]
    with open(os.path.join(basedir, "fes_timings"), "a") as f:
        for d, std, order in cases:
            name, ns = test_fes_timing(d, stdfes=std, order=order)
            f.write(f"{date} {run_id} {name} Update {ns:.0f}\n")
            print(name, f"{ns/1e6:.2f} ms")
    PrintTimers()
