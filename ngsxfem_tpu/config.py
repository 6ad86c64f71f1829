"""Global configuration for ngsxfem_tpu.

The quadrature-exactness contract of the reference test suite
(``tests/pytests/test_straightcutrule.py:31`` in ChrLackner/ngsxfem) demands
absolute errors below ``5e-15*(order+1)**2`` — only reachable in float64.  We
therefore enable JAX x64 mode at import time.  On TPU, float64 is emulated
(slow); performance-critical paths accept an explicit ``dtype`` argument so
benchmarks can run the compute pipeline in float32/bfloat16 while tests run
geometry in float64 (on the CPU backend).
"""
from __future__ import annotations

import os

import jax

# Honor JAX_PLATFORMS even when a site-installed PJRT plugin outranks it
# (e.g. the axon TPU plugin registers itself regardless of the env var):
# enforce the user's choice at the config level before any backend init.
if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover - unknown platform string
        pass

# Enable x64 before any array is created.  Users can opt out by setting
# NGSXFEM_TPU_X64=0 in the environment before importing the package.
if os.environ.get("NGSXFEM_TPU_X64", "1") != "0":
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: identical XLA programs (same shapes/graph)
# skip recompilation across calls and processes.  The dir is keyed by a host
# fingerprint: XLA:CPU caches AOT machine code compiled for the *build* host's
# CPU features, and replaying an entry from a different machine can SIGILL
# (the loader only warns).  A new host therefore gets a fresh cache dir.
def _host_fingerprint():
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    # the jax/XLA version participates too: XLA appends version-dependent
    # pseudo-features (+prefer-no-scatter/-gather) to its AOT target, so
    # entries compiled by a different XLA mismatch even on identical CPUs
    # (observed 2026-08-18: loader warned "SIGILL possible" on every load)
    return hashlib.sha1(
        f"{platform.machine()}|{feats}|{jax.__version__}".encode()
    ).hexdigest()[:12]


if os.environ.get("NGSXFEM_TPU_COMPCACHE", "1") != "0":
    _cache_dir = os.environ.get(
        "NGSXFEM_TPU_COMPCACHE_DIR",
        os.path.expanduser(f"~/.cache/ngsxfem_tpu_xla-{_host_fingerprint()}"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax versions
        pass

# TPU f32 matmul precision: the MXU default routes f32 einsums through bf16
# passes, measured to perturb assembled element matrices by ~3e-3 relative
# (docs/PERFORMANCE.md).  The numerically FATAL part — loss of element-matrix
# symmetry, which stalls CG/MG — is fixed structurally (kernels symmetrize,
# models/poisson.py), so the default stays "fastest"; set
# NGSXFEM_TPU_MATMUL_PRECISION=highest for CPU-equivalent f32 entries
# (costs HBM: "highest" changes fusion and materializes the padded einsum
# operands — nx=48 assembly then exceeds HBM unless block-streamed).
_prec = os.environ.get("NGSXFEM_TPU_MATMUL_PRECISION", "")
if _prec:
    try:
        jax.config.update("jax_default_matmul_precision", _prec)
    except Exception:  # pragma: no cover - older jax versions
        pass

import jax.numpy as jnp  # noqa: E402  (after x64 flag)
import numpy as np  # noqa: E402


class _Config:
    """Mutable global defaults."""

    def __init__(self):
        # dtype used for geometry/quadrature arrays created by the library
        self.dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        # integer dtype for index arrays (dof maps, element arrays)
        self.itype = jnp.int32
        # ABSOLUTE epsilon used to snap near-zero level-set vertex values to
        # +eps (sign-collapsing, exactly like the reference guard:
        # straightcutrule.cpp:553-554, spacetimecutrule.cpp:132); adjust for
        # level sets scaled far from O(1)
        self.lset_eps = 1e-14
        # threshold (ndof) below which ``Inverse`` materialises a dense matrix
        self.dense_solve_max_ndof = 20000
        # two-tier cut assembly in the public BilinearForm/LinearForm path:
        # standard rule on uncut elements + compacted cut kernel on a
        # fixed-capacity set of cut elements (NGSXFEM_TPU_TWO_TIER=0 forces
        # the old single-tier full-cut-kernel path)
        self.two_tier_assembly = os.environ.get(
            "NGSXFEM_TPU_TWO_TIER", "1") != "0"
        # banded subdivlvl>0 Integrate: uncut elements take a static
        # composite plain rule, only the interface band (fixed capacity)
        # runs the subdivision cut kernel — the reference legacy engine's
        # pruning (Simplex::CheckIfCut, cutint/xdecompose.hpp:34-87)
        # restored as a two-tier compaction (NGSXFEM_TPU_BANDED_SUBDIV=0
        # forces the uniform full-table path)
        self.banded_subdiv = os.environ.get(
            "NGSXFEM_TPU_BANDED_SUBDIV", "1") != "0"
        # second-tier compaction inside the band: descendants of
        # sign-uniform depth-1 children take plain mapped rules and only
        # MIXED children run the cut kernel (the reference's per-depth
        # pruning restored at depth 1, cutint/xdecompose.hpp:34-87);
        # NGSXFEM_TPU_SUBDIV_DEPTH1=0 falls back to the whole-band cut
        # kernel (round-4 behavior)
        self.subdiv_depth1_prune = os.environ.get(
            "NGSXFEM_TPU_SUBDIV_DEPTH1", "1") != "0"
        # emit jax.debug.print diagnostics when fixed-iteration Newton
        # searches (facet-patch neighbor map, shifted_eval) fail to converge
        # and fall back; off by default because debug callbacks force
        # device->host traffic on the tunneled TPU runtime
        self.newton_debug = os.environ.get(
            "NGSXFEM_TPU_NEWTON_DEBUG", "0") != "0"

    @property
    def np_dtype(self):
        # np.dtype() canonicalizes both numpy scalar types and jnp type
        # aliases (jnp.float32 etc. are numpy scalar types under the hood)
        return np.dtype(self.dtype)


config = _Config()


def set_default_dtype(dtype):
    """Set the default floating dtype for newly created meshes/spaces."""
    config.dtype = dtype
