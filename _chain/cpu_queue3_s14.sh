#!/bin/bash
# Session-14 queue #3: clean SUSTAINED_r04 re-run once the CPU suite frees
# the core (the first capture overlapped the full pytest suite on this
# 1-core host — host-dispatch contention depressed steady img/s to 552).
# After a reboot: nohup bash _chain/cpu_queue3_s14.sh & disown
set -u
cd /root/repo
LOG=_chain/ab_results.log
echo "[cpu q3] start $(date -u +%FT%TZ)" >> "$LOG"
until grep -q "cpu q2. done\|\[cpu q2\] done" "$LOG"; do sleep 60; done
if [ ! -s SUSTAINED_r04.json ]; then
  echo "[cpu q3] clean sustained re-run..." >> "$LOG"
  timeout 7200 python -u _sustained_probe.py SUSTAINED_r04.json \
    > _chain/sustained_r04b.log 2>&1
  rc=$?
  echo "[cpu q3] sustained rc=$rc: $(python -c "
import json
try: d=json.load(open('SUSTAINED_r04.json')); print(d.get('img_per_s_steady'))
except Exception as e: print('err', e)")" >> "$LOG"
fi
echo "[cpu q3] done $(date -u +%FT%TZ)" >> "$LOG"
