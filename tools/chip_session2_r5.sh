#!/bin/bash
# Round-5 chip session 2 (runs after the A/B session):
#   A2       bench defaults at 256^2 on the round-5 code (isolates the
#            solar-bf16 cache tier from the code-version confound in
#            session 1's config A, which imported pre-round-5 modules)
#   P        bench BENCH_PALLAS=1 at 256^2 — fused A-apply kernel
#            in-context end-to-end (verdict item 2 keep-or-kill)
#   PROFILE  tools/profile_phases.py at 256^2 -> docs/PROFILE_r5.md
#   ACC      tools/uniform_accuracy.py at 256^2 -> docs/UNIFORM_256_r5.log
#            (verdict item 5b BASELINE-scale accuracy evidence)
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

echo "== round-5 256^2 session 2 start $(date -u) ==" >> "$LOG"
# A2: same code as B, only the cache knob differs -> isolates the
# solar-bf16 tier (ADVICE r4); precond pinned to the session-1 default
run A2 BENCH_CHUNK=1 BENCH_SPECINT_CACHE=auto BENCH_PRECOND=two_level_32
# P: vs D isolates the fused A-apply kernel (same cf=4 + auto cache)
run P BENCH_CHUNK=1 BENCH_PALLAS=1 BENCH_SPECINT_CACHE=auto BENCH_PRECOND=two_level_64
# F: vs D isolates one-step-finer coarse grid (128^2, cf=2)
run F BENCH_CHUNK=1 BENCH_SPECINT_CACHE=auto BENCH_PRECOND=two_level_128

echo "== profile_phases 256^2 $(date -u) ==" >> "$LOG"
env BENCH_NX=256 BENCH_NY=256 BENCH_NZLOW=112 BENCH_DZLOW=50 \
  timeout 4500 python tools/profile_phases.py > docs/PROFILE_r5_raw.md 2>> "$LOG"
echo "== profile rc=$? ==" >> "$LOG"

echo "== uniform_accuracy 256^2 $(date -u) ==" >> "$LOG"
env BENCH_NX=256 BENCH_NY=256 BENCH_NZLOW=112 BENCH_DZLOW=50 \
  timeout 4500 python tools/uniform_accuracy.py > docs/UNIFORM_256_r5.log 2>&1
echo "== uniform rc=$? ==" >> "$LOG"
echo "== session 2 done $(date -u) ==" >> "$LOG"
