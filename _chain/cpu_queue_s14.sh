#!/bin/bash
# Session-14 CPU-side queue (serialize CPU-heavy jobs on the 1-core host):
#   1. wait for the canonical-shape dryrun_multichip(8) (pid 29174)
#   2. UAMT training-trajectory parity study -> appends to PARITY_TRAIN.md
# After a reboot just rerun: nohup bash _chain/cpu_queue_s14.sh & disown
set -u
cd /root/repo
LOG=_chain/ab_results.log
echo "[cpu q] start $(date -u +%FT%TZ)" >> "$LOG"
while kill -0 29174 2>/dev/null; do sleep 30; done
echo "[cpu q] dryrun done: $(grep -a 'canonical' _chain/multichip_canonical_r04.log | tail -2 | tr '\n' ' ')" >> "$LOG"

if ! grep -q "## UAMT" PARITY_TRAIN.md 2>/dev/null; then
  echo "[cpu q] parity_uamt (1000 iters)..." >> "$LOG"
  JAX_PLATFORMS=cpu timeout 7200 python -u scripts/parity_uamt.py --iters 1000 \
    > _chain/parity_uamt_s14.log 2>&1
  rc=$?
  echo "[cpu q] parity_uamt rc=$rc: $(tail -1 _chain/parity_uamt_s14.log)" >> "$LOG"
fi
echo "[cpu q] done $(date -u +%FT%TZ)" >> "$LOG"
