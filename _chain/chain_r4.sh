#!/bin/bash
# Round-3 validation chain, session-7 (post second host reboot).
# Persistent under the repo so a reboot cannot erase progress; steps that
# already produced their artifact are skipped on relaunch (idempotent).
# ONE TPU job at a time — everything here is strictly serial.
set -u
cd /root/repo
D=/root/repo/_chain
LOG=$D/ab_results.log
export HPFG_LIVENESS_S=900

say() { echo "[chain_r4 $(date +%H:%M:%S)] $*" >> "$LOG"; }

ALLFLAGS="HPFG_FUSED_PAIR=1 HPFG_FUSED_STEM=1 HPFG_POOL=sliced HPFG_IM2COL=shift"

run_gate() { # name flags...
  local name=$1; shift
  if [ -s "$D/TPU_GATE_$name.json" ]; then say "gate $name: cached, skip"; return 0; fi
  say "gate $name: start ($*)"
  env "$@" timeout 5400 python scripts/tpu_gate.py >> "$LOG" 2>&1
  local rc=$?
  cp -f TPU_GATE.json "$D/TPU_GATE_$name.json" 2>/dev/null
  say "gate $name: rc=$rc"
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

say "=== chain r4 start ==="

if run_gate allflags HPFG_FUSED_PAIR=1 HPFG_FUSED_STEM=1 HPFG_POOL=sliced HPFG_IM2COL=shift; then
  say "allflags gate GREEN"
else
  say "allflags gate FAILED — isolating per flag"
  run_gate pair   HPFG_FUSED_PAIR=1
  run_gate stem   HPFG_FUSED_STEM=1
  run_gate pool   HPFG_POOL=sliced
  run_gate im2col HPFG_IM2COL=shift
fi

run_bench baseline       HPFG_NOOP=0
run_bench pair           HPFG_FUSED_PAIR=1
run_bench stem           HPFG_FUSED_STEM=1
run_bench pool           HPFG_POOL=sliced
run_bench im2col         HPFG_IM2COL=shift
run_bench all            HPFG_FUSED_PAIR=1 HPFG_FUSED_STEM=1 HPFG_POOL=sliced HPFG_IM2COL=shift
run_bench shift_extbf16  HPFG_IM2COL=shift HPFG_EXT_BF16=1
run_bench shift_minw56   HPFG_IM2COL=shift HPFG_FUSED_MINW=56

say "=== recovery chain r4 done ==="
