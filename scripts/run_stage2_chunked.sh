#!/bin/bash
# Chunked stage-2 acceptance runner: bounds each process's RSS (the axon
# tunnel client retains every device_put'd host buffer — ~2.1 GB per
# host-staged config-3 sequence iteration; round-4 OOM post-mortem) by
# stopping cleanly every CHUNK iterations and resuming from the checkpoint.
#
# Usage: run_stage2_chunked.sh OUT_DIR TOTAL_ITERS CHUNK [extra acceptance args...]
set -u
OUT=$1; TOTAL=$2; CHUNK=$3; shift 3

for round in $(seq 1 100); do
  RES=""
  if [ -f "$OUT/stage2_ckpt.msgpack" ]; then
    RES="--resume-from $OUT/stage2_ckpt.msgpack"
  fi
  python scripts/acceptance_full.py stage2 --iters "$TOTAL" --out "$OUT" \
      --stop-after "$CHUNK" $RES "$@"
  code=$?
  completed=$(python -c "import json;print(json.load(open('$OUT/stage2_result.json'))['completed'])" 2>/dev/null || echo unknown)
  echo "[chunked] round $round exit=$code completed=$completed"
  if [ "$completed" = "True" ]; then
    exit 0
  fi
  if [ "$code" != "3" ] && [ "$code" != "0" ]; then
    # Crash (e.g. OOM kill): resume anyway, but back off briefly.
    sleep 10
  fi
done
echo "[chunked] gave up after 100 rounds"
exit 1
