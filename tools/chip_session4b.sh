#!/bin/bash
# Round-5 LUT session, take 2 (the first create_lut attempt hit a TPU
# worker crash ~12 min into direct-source tracing; all progress up to
# the crash is in data/luts/ckpt_8_10_production/).
#
# Strategy: resume with dir rounds capped at 2 (time box); on ANY
# failure retry once with dir rounds=1 — the checkpoint makes the
# retry incremental, and a complete-but-noisier table beats no table
# (dir2dir is closed-form at solve time; only the smooth dir2diff
# scattering source comes from these axes).  Finish with a default
# bench run: the verdict-item-8 back-to-back proof.
set -u
cd "$(dirname "$0")/.."
LOG=docs/LUT_8_10_r5.log

echo "== 8_10 take-2 (resume, dir rounds<=2) $(date -u) ==" >> "$LOG"
timeout 3000 python tools/create_lut.py 8_10 --preset production \
  --max-rounds 8 --dir-max-rounds 2 >> "$LOG" 2>&1
rc=$?
echo "== create_lut take-2 rc=$rc $(date -u) ==" >> "$LOG"
if [ "$rc" -ne 0 ]; then
  echo "== 8_10 take-3 (resume, dir rounds=1 fallback) $(date -u) ==" >> "$LOG"
  timeout 2400 python tools/create_lut.py 8_10 --preset production \
    --max-rounds 8 --dir-max-rounds 1 >> "$LOG" 2>&1
  echo "== create_lut take-3 rc=$? $(date -u) ==" >> "$LOG"
fi

echo "== back-to-back bench (verdict item 8 proof) $(date -u) ==" >> "$LOG"
BENCH_DEADLINE=1500 timeout 1800 python bench.py >> "$LOG" 2>&1
echo "== bench rc=$? $(date -u) ==" >> "$LOG"
