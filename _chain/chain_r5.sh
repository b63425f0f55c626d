#!/bin/bash
# Round-3 session-10 chain: validate the flipped dispatch defaults
# (HPFG_FUSED_PAIR / HPFG_FUSED_STEM now default "1" in layers.py), then the
# p4 shift-im2col A/B, then the three outstanding artifacts (s4 smoke,
# cache probe, sustained refresh). Strictly serial — ONE TPU job at a time.
# Idempotent: steps that already produced their artifact are skipped.
set -u
cd /root/repo
D=/root/repo/_chain
LOG=$D/ab_results.log
export HPFG_LIVENESS_S=1800

say() { echo "[chain_r5 $(date +%H:%M:%S)] $*" >> "$LOG"; }

run_gate() { # name flags...
  local name=$1; shift
  if [ -s "$D/TPU_GATE_$name.json" ]; then say "gate $name: cached, skip"; return 0; fi
  say "gate $name: start ($*)"
  env "$@" timeout 7200 python scripts/tpu_gate.py >> "$LOG" 2>&1
  local rc=$?
  cp -f TPU_GATE.json "$D/TPU_GATE_$name.json" 2>/dev/null
  say "gate $name: rc=$rc $(python -c "import json;d=json.load(open('$D/TPU_GATE_$name.json'));print(d.get('ok'))" 2>/dev/null)"
  return $rc
}

run_bench() { # name flags...
  local name=$1; shift
  if [ -s "$D/bench_$name.json" ]; then say "bench $name: cached, skip"; return 0; fi
  say "bench $name: start ($*)"
  env "$@" timeout 3600 python bench.py > "$D/bench_$name.raw" 2>> "$LOG"
  local rc=$?
  grep -o '{.*}' "$D/bench_$name.raw" | tail -1 > "$D/bench_$name.json"
  say "bench $name: rc=$rc $(cat "$D/bench_$name.json")"
  return $rc
}

say "=== chain r5 start (defaults: pair+stem ON) ==="

# 0. CPU interpret sanity of the committed p4 shift construction.
if [ ! -s "$D/shift_interp.ok" ]; then
  say "shift interpret tests (CPU): start"
  timeout 3600 python -m pytest tests/test_fused_conv_block.py -k TestShiftIm2col -q \
    >> "$LOG" 2>&1
  rc=$?
  say "shift interpret tests: rc=$rc"
  [ $rc -eq 0 ] && echo ok > "$D/shift_interp.ok"
else
  say "shift interpret tests: cached, skip"
fi

# 1. Gate + bench at the NEW DEFAULTS (pair+stem on, pool pairwise, roll im2col).
run_gate defaults
run_bench defaults

# 2. p4 shift im2col on top of the defaults.
if run_gate im2col_p4 HPFG_IM2COL=shift; then
  run_bench shift          HPFG_IM2COL=shift
  run_bench shift_extbf16  HPFG_IM2COL=shift HPFG_EXT_BF16=1
else
  say "im2col p4 gate FAILED — shift stays opt-in, skipping its benches"
fi

# 3. Outstanding round-3 artifacts (VERDICT items), at the shipping defaults.
if [ ! -s "S4_SMOKE_r03.json" ]; then
  say "s4 train smoke: start"
  timeout 3600 python -u _s4_train_probe.py >> "$LOG" 2>&1
  say "s4 train smoke: rc=$? $(tail -c 300 S4_SMOKE_r03.json 2>/dev/null | tr -d '\n')"
else
  say "s4 train smoke: cached, skip"
fi

if grep -q deferred CACHE_PROBE_r03.json 2>/dev/null || [ ! -s CACHE_PROBE_r03.json ]; then
  say "cache probe: start"
  timeout 10800 python -u _cache_probe.py >> "$LOG" 2>&1
  say "cache probe: rc=$? $(tail -c 400 CACHE_PROBE_r03.json 2>/dev/null | tr -d '\n')"
else
  say "cache probe: cached, skip"
fi

if [ ! -s "SUSTAINED_r03b.json" ]; then
  say "sustained refresh: start"
  timeout 7200 python -u _sustained_probe.py SUSTAINED_r03b.json >> "$LOG" 2>&1
  say "sustained refresh: rc=$? $(tail -c 300 SUSTAINED_r03b.json 2>/dev/null | tr -d '\n')"
else
  say "sustained refresh: cached, skip"
fi

say "=== chain r5 done ==="
