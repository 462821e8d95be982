#!/bin/bash
# Sequential bench.py sweep on the real chip (PERF.md round-7/8): the
# multi-chain dispatch x fast-profile matrix.  One variant at a time so
# chain timings never contend for the chip; each line of the output file
# is one bench.py JSON result.
#
# Usage: bash tools/bench_sweep.sh OUT.jsonl "--chains 4" "--fast 8 --chains 4" ...
set -u
out="$1"; shift
cd "$(dirname "$0")/.."
for v in "$@"; do
  echo "[sweep] bench.py $v" >&2
  line=$(timeout 3600 python bench.py $v 2>/dev/null | tail -1)
  echo "{\"args\": \"$v\", \"result\": $line}" >> "$out"
done
echo "[sweep] done -> $out" >&2
