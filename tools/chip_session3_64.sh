#!/bin/bash
# Round-5 chip session 3: 64^2 A/Bs — the driver's BENCH_r05 runs plain
# `python bench.py` at the 64^2 default, so the 64^2 knob choices ARE
# the official headline.  Each run ~6 min.
#   H  HEAD defaults (round-5 code: tiered edir, factored line PC,
#      optimal-scale seeding; cf auto->2, cache auto->f32 at this size)
#   I  two_level_64 -> cf=1 (exact layer-mean coarse solve at 64^2)
#   J  BENCH_PALLAS=1 (fused A-apply kernel in-context at 64^2)
#   K  band_chunk=4 vs default 8
set -u
cd "$(dirname "$0")/.."
LOG=docs/BENCH_64_r5.log
BASE="BENCH_DEADLINE=1800"

run() {
  local tag="$1"; shift
  echo "=== [$tag] $(date -u +%H:%M:%S) env: $* ===" >> "$LOG"
  env $BASE "$@" timeout 2000 python bench.py >> "$LOG" 2>&1
  echo "=== [$tag] rc=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
}

echo "== round-5 64^2 A/B session start $(date -u) ==" >> "$LOG"
run H
run I BENCH_PRECOND=two_level_64
run J BENCH_PALLAS=1
run K BENCH_CHUNK=4
echo "== session 3 done $(date -u) ==" >> "$LOG"
