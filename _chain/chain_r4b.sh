#!/bin/bash
# Follower: waits for chain_r4, then validates the GREEN trio
# (pair+stem+pool — shift im2col failed its Mosaic gate, see
# TPU_GATE_im2col.json, so it is excluded), then runs the two probes.
# Strictly serial: one TPU job at a time.
set -u
cd /root/repo
D=/root/repo/_chain
LOG=$D/ab_results.log
export HPFG_LIVENESS_S=1800

say() { echo "[chain_r4b $(date +%H:%M:%S)] $*" >> "$LOG"; }

until grep -q "recovery chain r4 done" "$LOG" 2>/dev/null; do sleep 120; done

say "=== chain r4b start (green-trio variant) ==="

if [ ! -s "$D/mosaic_probe.json" ]; then
  say "mosaic layout probe: interpret sanity pass (CPU)"
  env HPFG_PROBE_INTERPRET=1 JAX_PLATFORMS=cpu timeout 900 \
    python -u _mosaic_probe.py >> "$LOG" 2>&1
  say "mosaic probe interpret: rc=$?"
  say "mosaic layout probe: TPU pass"
  timeout 1800 python -u _mosaic_probe.py >> "$LOG" 2>&1
  say "mosaic probe TPU: rc=$? $(cat $D/mosaic_probe.json 2>/dev/null | tr -d '\n' | head -c 400)"
else
  say "mosaic probe: cached, skip"
fi

if [ ! -s "$D/TPU_GATE_trio.json" ]; then
  say "trio combo gate (pair+stem+pool): start"
  env HPFG_FUSED_PAIR=1 HPFG_FUSED_STEM=1 HPFG_POOL=sliced \
    timeout 7200 python scripts/tpu_gate.py >> "$LOG" 2>&1
  rc=$?
  cp -f TPU_GATE.json "$D/TPU_GATE_trio.json" 2>/dev/null
  say "trio combo gate: rc=$rc"
else
  say "trio combo gate: cached, skip"
fi

if [ ! -s "$D/bench_trio.json" ]; then
  say "bench trio: start"
  env HPFG_FUSED_PAIR=1 HPFG_FUSED_STEM=1 HPFG_POOL=sliced \
    timeout 3600 python bench.py > "$D/bench_trio.raw" 2>> "$LOG"
  rc=$?
  grep -o '{.*}' "$D/bench_trio.raw" | tail -1 > "$D/bench_trio.json"
  say "bench trio: rc=$rc $(cat "$D/bench_trio.json")"
else
  say "bench trio: cached, skip"
fi

if [ ! -s "S4_SMOKE_r03.json" ]; then
  say "s4 train smoke: start"
  timeout 3600 python -u _s4_train_probe.py >> "$LOG" 2>&1
  say "s4 train smoke: rc=$? $(tail -c 300 S4_SMOKE_r03.json 2>/dev/null | tr -d '\n')"
else
  say "s4 train smoke: cached, skip"
fi

if [ ! -s "CACHE_PROBE_r03.json" ]; then
  say "cache probe: start"
  timeout 10800 python -u _cache_probe.py >> "$LOG" 2>&1
  say "cache probe: rc=$?"
else
  say "cache probe: cached, skip"
fi

say "=== chain r4b done ==="
