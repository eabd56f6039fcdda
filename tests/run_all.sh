#!/bin/sh
# Run the full suite as one pytest process per top-level test directory.
#
# A single process accumulates XLA:CPU executables across all ~70 test
# files; the largest late compiles (pooled-NUTS warmup scans) have
# segfaulted inside backend_compile under that state while passing in any
# smaller run.  tests/conftest.py clears jit caches between modules, which
# mitigates, but per-directory processes are the deterministic fix.
# Serialize everything — the box may have a single CPU.
set -e
cd "$(dirname "$0")/.."
for d in tests/*/ ; do
    case "$d" in
        tests/_gcn_fixtures/) continue ;;  # data, not tests
    esac
    echo "=== $d"
    python -m pytest "$d" -q
done
echo "=== tests (top-level files)"
python -m pytest tests/test_*.py -q
