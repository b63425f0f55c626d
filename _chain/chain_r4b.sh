#!/bin/bash
# Follower: waits for chain_r4, then (1) re-runs the allflags COMBO gate
# (its first attempt hit the post-reboot cold-Execute stall — the very
# first Execute took >900 s while the next process connected in seconds),
# (2) s4cvnet 100-iter train smoke (VERDICT#2 artifact), (3) device_cache
# augment decomposition probe. Strictly serial: one TPU job at a time.
set -u
cd /root/repo
D=/root/repo/_chain
LOG=$D/ab_results.log
export HPFG_LIVENESS_S=1800

say() { echo "[chain_r4b $(date +%H:%M:%S)] $*" >> "$LOG"; }

until grep -q "recovery chain r4 done" "$LOG" 2>/dev/null; do sleep 120; done

say "=== chain r4b start ==="

say "combo gate (all four flags): start"
env HPFG_FUSED_PAIR=1 HPFG_FUSED_STEM=1 HPFG_POOL=sliced HPFG_IM2COL=shift \
  timeout 7200 python scripts/tpu_gate.py >> "$LOG" 2>&1
rc=$?
cp -f TPU_GATE.json "$D/TPU_GATE_allflags2.json" 2>/dev/null
say "combo gate: rc=$rc"

say "s4 train smoke: start"
timeout 3600 python -u _s4_train_probe.py >> "$LOG" 2>&1
say "s4 train smoke: rc=$? $(tail -c 300 S4_SMOKE_r03.json 2>/dev/null | tr -d '\n')"

say "cache probe: start"
timeout 10800 python -u _cache_probe.py >> "$LOG" 2>&1
say "cache probe: rc=$?"

say "=== chain r4b done ==="
