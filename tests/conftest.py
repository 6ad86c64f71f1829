"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py; the accuracy contracts (float64
exactness) are hardware-independent and run on the CPU backend, where the
multi-device sharding paths are validated on 8 virtual devices.
"""
import os
import sys

# FORCE the cpu backend.  The ambient env may pin the TPU plugin via
# JAX_PLATFORMS=axon AND pre-import jax in sitecustomize — so setting
# os.environ here is too late; the jax config must be updated directly.
# Override with NGSXFEM_TEST_PLATFORM if needed.
_plat = os.environ.get("NGSXFEM_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _plat
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# XLA:CPU JIT-compiles thousands of executables over a full-suite run; each
# adds mmap'd code pages and the kernel default vm.max_map_count=65530 runs
# out ~45 min in, segfaulting inside backend_compile_and_load.  Raise it
# when permitted (root); harmless no-op otherwise.  See tests/run_suite.sh.
try:
    with open("/proc/sys/vm/max_map_count", "r+") as _f:
        if int(_f.read()) < 1048576:
            _f.seek(0)
            _f.write("1048576")
except OSError:
    pass

import jax  # noqa: E402  (possibly already imported by sitecustomize)

jax.config.update("jax_platforms", _plat)
assert jax.devices()[0].platform == _plat, (
    f"test suite must run on {_plat!r}, got {jax.devices()[:2]} — was a "
    "backend already initialized before conftest?"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
