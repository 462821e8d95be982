#!/usr/bin/env bash
# Sharded full-suite runner for hosts where vm.max_map_count cannot be
# raised (tests/conftest.py::_raise_max_map_count is a no-op without root).
#
# Root cause being worked around (PERF/VERDICT round-2/3): ~200 tests of XLA
# CPU compiles + the torch co-load accumulate ~65k memory maps in ONE
# process; at the kernel default vm.max_map_count=65530 the process
# segfaults mid-compile.  Running the suite as N independent pytest
# processes keeps each process's map count well below the cap.
#
# Usage: tools/run_suite_sharded.sh [N_SHARDS] [extra pytest args...]
#   MRISR_SLOW_TESTS=1 tools/run_suite_sharded.sh 3   # full suite incl. slow leg
set -u
cd "$(dirname "$0")/.."
N="${1:-3}"
shift 2>/dev/null || true

mapfile -t FILES < <(ls tests/test_*.py | sort)
rc=0
for ((i = 0; i < N; i++)); do
  SHARD=()
  for ((j = i; j < ${#FILES[@]}; j += N)); do
    SHARD+=("${FILES[$j]}")
  done
  echo "=== shard $((i + 1))/$N: ${SHARD[*]} ==="
  python -m pytest "${SHARD[@]}" -q "$@" || rc=1
done
exit $rc
