#!/bin/bash
# Round-5 chip session H1 (runs after the 64^2 session):
#   H1  256^2 bench at the NEW shipped defaults — isolates the Hermitian
#       mode reduction (b455781, unconditional in the PC build) against
#       session-2's config D (two_level_64, pre-Hermitian): D was
#       cold 122.2 s / perturbed 527.1 cols/s.  The shipped HEAD default
#       at >=256 grids must never again be an unmeasured configuration
#       (round-4 verdict weak #2).
#   P2  same + BENCH_PALLAS=1 — the REWRITTEN (Z,X,dof,Y)-layout fused
#       A-apply kernel in-context keep-or-kill (session-2's P died in
#       Mosaic lowering before producing a number).
#   PROFILE  phase profile at 256^2 with the final config -> the
#       PROFILE_r5 ms/iter evidence for verdict item 2.
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

echo "== round-5 256^2 session H1 start $(date -u) ==" >> "$LOG"
run H1 BENCH_CHUNK=1
run P2 BENCH_CHUNK=1 BENCH_PALLAS=1

echo "== profile_phases 256^2 (final config) $(date -u) ==" >> "$LOG"
env BENCH_NX=256 BENCH_NY=256 BENCH_NZLOW=112 BENCH_DZLOW=50 \
  timeout 4500 python tools/profile_phases.py > docs/PROFILE_r5_final.md 2>> "$LOG"
echo "== profile rc=$? ==" >> "$LOG"
echo "== session H1 done $(date -u) ==" >> "$LOG"
