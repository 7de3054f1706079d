#!/bin/bash
# Round-5 BASELINE-scale A/B session (verdict item 3): one unattended
# chip session measuring every shipped-but-unmeasured knob at 256^2x128.
#   A  HEAD defaults        (auto cache incl. the solar bf16 tier c611d85)
#   B  BENCH_SPECINT_CACHE=off   (round-4's effective config — isolates the tier)
#   C  BENCH_CHUNK=2        (difficulty-grouped band chunks vs chunk=1)
#   D  BENCH_PRECOND=two_level_64  (cf=4 finer coarse grid)
#   E  BENCH_EXTRAPOLATE=1  (extrapolated warm starts, d929e92)
# Appends annotated bench stderr+json to docs/BENCH_256_r5.log.
set -u
cd "$(dirname "$0")/.."
LOG=docs/BENCH_256_r5.log
BASE="BENCH_NX=256 BENCH_NY=256 BENCH_NZLOW=112 BENCH_DZLOW=50 BENCH_REPS=1 BENCH_DEADLINE=4200"

run() {
  local tag="$1"; shift
  echo "=== [$tag] $(date -u +%H:%M:%S) env: $* ===" >> "$LOG"
  env $BASE "$@" timeout 4500 python bench.py >> "$LOG" 2>&1
  echo "=== [$tag] rc=$? $(date -u +%H:%M:%S) ===" >> "$LOG"
}

echo "== round-5 256^2 A/B session start $(date -u) ==" >> "$LOG"
run A BENCH_CHUNK=1
run B BENCH_CHUNK=1 BENCH_SPECINT_CACHE=off
run C BENCH_CHUNK=2
run D BENCH_CHUNK=1 BENCH_PRECOND=two_level_64
run E BENCH_CHUNK=1 BENCH_EXTRAPOLATE=1
echo "== session done $(date -u) ==" >> "$LOG"
