#!/bin/bash
# Round-5 chip session 4: 8_10 production-density table (verdict item 6)
# followed IMMEDIATELY by a default bench run — the round-4 failure mode
# was a long LUT job wedging the device claim for the next tool; the
# done-criterion for verdict item 8 is exactly this back-to-back
# sequence completing in one session.
#
# Staged generation (tools/create_lut.py docs): a low adaptive-round cap
# first guarantees a COMPLETE committed table inside the budget;
# checkpoints make any follow-up pass incremental.
set -u
cd "$(dirname "$0")/.."
LOG=docs/LUT_8_10_r5.log

echo "== 8_10 production table $(date -u) ==" >> "$LOG"
timeout 5400 python tools/create_lut.py 8_10 --preset production \
  --max-rounds "${LUT_MAX_ROUNDS:-8}" --dir-max-rounds "${LUT_DIR_MAX_ROUNDS:-4}" \
  >> "$LOG" 2>&1
echo "== create_lut rc=$? $(date -u) ==" >> "$LOG"

echo "== back-to-back bench (verdict item 8 proof) $(date -u) ==" >> "$LOG"
BENCH_DEADLINE=1800 timeout 2000 python bench.py >> "$LOG" 2>&1
echo "== bench rc=$? $(date -u) ==" >> "$LOG"
