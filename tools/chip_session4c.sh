#!/bin/bash
# Round-5 LUT session, take 4.  Post-mortem of takes 1-3:
#   take 1  rc=1  missing checkpoint dir (fixed in optprop/lut.py)
#   take 2  rc=143  operator kill (rounds=2 pass would not fit the
#           round's remaining wall clock)
#   take 3  rc=1  UNAVAILABLE on the FIRST device op — a cascade of
#           take-2's mid-op kill (worker still restarting), not a new
#           kernel fault.  The one genuine fault was 20:42, ~12 min
#           into dir tracing.
# Strategy: up to 3 resume attempts with a worker-recovery pause
# between them (checkpoints make each attempt incremental), then the
# back-to-back default bench (verdict item 8 proof).
set -u
cd "$(dirname "$0")/.."
LOG=docs/LUT_8_10_r5.log

for att in 4 5 6; do
  echo "== 8_10 take-$att (resume, dir rounds=1) $(date -u) ==" >> "$LOG"
  timeout 2400 python tools/create_lut.py 8_10 --preset production \
    --max-rounds 8 --dir-max-rounds 1 >> "$LOG" 2>&1
  rc=$?
  echo "== create_lut take-$att rc=$rc $(date -u) ==" >> "$LOG"
  [ "$rc" -eq 0 ] && break
  sleep 20  # let the TPU worker finish restarting before reconnecting
done

echo "== back-to-back bench (verdict item 8 proof) $(date -u) ==" >> "$LOG"
BENCH_DEADLINE=1500 timeout 1800 python bench.py >> "$LOG" 2>&1
echo "== bench rc=$? $(date -u) ==" >> "$LOG"
