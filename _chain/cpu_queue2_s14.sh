#!/bin/bash
# Session-14 CPU queue #2: full CPU suite at the final tree, after the
# parity_uamt study releases the core.
# After a reboot: nohup bash _chain/cpu_queue2_s14.sh & disown
set -u
cd /root/repo
LOG=_chain/ab_results.log
echo "[cpu q2] start $(date -u +%FT%TZ)" >> "$LOG"
while kill -0 "$(cat _chain/parity_uamt.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
echo "[cpu q2] parity done: $(tail -1 _chain/parity_uamt_s14.log)" >> "$LOG"
echo "[cpu q2] full CPU suite..." >> "$LOG"
timeout 10800 python -m pytest tests/ -q > _chain/suite_s14.log 2>&1
rc=$?
echo "[cpu q2] suite rc=$rc: $(tail -1 _chain/suite_s14.log)" >> "$LOG"
echo "[cpu q2] done $(date -u +%FT%TZ)" >> "$LOG"
