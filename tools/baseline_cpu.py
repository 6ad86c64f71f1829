"""Measured CPU baseline proxy driver (native/baseline_cpu_proxy.cpp).

Builds (g++ -O3) and runs the single-threaded C++ proxy of the reference's
per-element cut-assembly algorithm on this host, validates its NEG volume
against the analytic sphere volume, and prints the proxy JSON next to the
framework's own figures.  See the C++ header comment and BASELINE.md
("Measured CPU speed-of-light proxy") for what this number does and does
NOT mean: it bounds hand-specialized single-core CPU performance on the
reduced problem (no ghost penalty / Nitsche / general machinery), it is
NOT a measurement of the reference framework.

    python tools/baseline_cpu.py [nx]
"""
import json
import math
import os
import subprocess
import sys


def run(nx=48):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(root, "native", "baseline_cpu_proxy.cpp")
    exe = os.path.join(root, "native", "baseline_proxy")
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        subprocess.run(["g++", "-O3", "-march=native", "-std=c++17",
                        src, "-o", exe], check=True)
    best = None
    for _ in range(3):
        out = subprocess.run([exe, str(nx)], capture_output=True, text=True,
                             check=True)
        r = json.loads(out.stdout)
        if best is None or r["assemble_seconds"] < best["assemble_seconds"]:
            best = r
    # validation: NEG volume ~ analytic sphere volume, O(h^2)
    exact = 4.0 / 3.0 * math.pi * 0.3 ** 3
    rel = abs(best["neg_volume"] - exact) / exact
    assert rel < 10.0 / nx ** 2 + 5e-3, (best["neg_volume"], exact)
    best["neg_volume_rel_err_vs_analytic"] = rel
    return best


if __name__ == "__main__":
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    print(json.dumps(run(nx)))
