#!/usr/bin/env bash
# Tiered test runner (SURVEY.md §4 test strategy; VERDICT round-1 weak #10).
#
#   fast tier:  unit/property/mock tests, one process, ~4 min CPU
#   e2e tier:   full keygen/prove/verify pipelines, ONE PROCESS PER FILE —
#               long pytest processes that compile many large executables
#               have segfaulted inside JAX's persistent-cache zstd
#               (de)serialization (observed 2026-08-17, nondeterministic,
#               always after ~40 min in one process); per-file isolation
#               sidesteps the accumulated-process state.
#
# Usage: scripts/run_tests.sh [fast|e2e|all]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
# LLVM's JIT mmaps code sections per compiled executable; the e2e tier
# compiles enough large modules to exhaust vm.max_map_count (default
# 65530) — observed as "LLVM compilation error: Cannot allocate memory"
# and segfaults inside backend_compile. Raise it when we can.
sysctl -qw vm.max_map_count=1048576 2>/dev/null || true
tier="${1:-all}"
rc=0

if [ "$tier" = fast ] || [ "$tier" = all ]; then
    t0=$(date +%s)
    python -m pytest tests/ -x -q -m "not e2e and not slow" || rc=1
    echo "[run_tests] fast tier wall time: $(( $(date +%s) - t0 ))s" \
         "(target <=300s on an idle 4-vCPU host)"
fi
if [ "$tier" = e2e ] || [ "$tier" = all ]; then
    # derive the file list so a future e2e/slow-marked file cannot be
    # silently skipped (ADVICE.md round-2 low)
    for f in $(grep -l 'pytest\.mark\.\(e2e\|slow\)' tests/test_*.py); do
        python -m pytest "$f" -x -q -m "e2e or slow" || rc=1
    done
fi
exit $rc
