#!/usr/bin/env bash
# Run the test suite one file per process.
#
# XLA:CPU can segfault inside backend_compile_and_load after several thousand
# compilations in a single long-lived process (observed at ~45 min of suite
# runtime; the crash is in the compiler, not in any test — every file passes
# in isolation).  Root cause is virtual-memory map exhaustion: each compiled
# executable adds mmap'd code pages and the default vm.max_map_count=65530
# runs out.  Prefer raising it (root):
#     sysctl -w vm.max_map_count=1048576
# Per-file processes below sidestep the accumulation regardless, and the
# persistent compilation cache (ngsxfem_tpu/config.py) makes the split cheap:
# recompiles across processes are cache loads.
set -u
cd "$(dirname "$0")/.."
fail=0
for f in tests/test_*.py; do
    echo "=== $f"
    python -m pytest "$f" -q || fail=1
done
exit $fail
