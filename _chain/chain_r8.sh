#!/bin/bash
# Round-4 recovery chain r8: gate + A/B benches for the backward folds
# (HPFG_DUAL_BWD / HPFG_FOLD_REDUCE), written while the tunnel is down
# (bench hit the 600 s liveness guard at 11:52 2026-08-20).
#
# Legs (idempotent; artifact written only on rc==0 + JSON-validated):
#   1. tpu_gate with BOTH new flags on  -> _chain/TPU_GATE_dualbwd.json
#   2. bench baseline (defaults)        -> _chain/bench_r04_base.json
#   3. bench HPFG_DUAL_BWD=1            -> _chain/bench_r04_dual.json
#   4. bench HPFG_FOLD_REDUCE=1         -> _chain/bench_r04_fold.json
#   5. bench both                       -> _chain/bench_r04_dualfold.json
#
# After any reboot:  nohup bash _chain/chain_r8.sh > /dev/null 2>&1 & disown
set -u
cd /root/repo
LOG=_chain/ab_results.log
echo "[chain r8] start $(date -u +%FT%TZ)" >> "$LOG"

probe_tunnel() {
  # devices() can list while Executes hang (session-13) — probe a REAL
  # execute + readback, the same thing require_live_device checks
  timeout 180 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((8, 8)); float(np.asarray(x @ x)[0, 0])" > /dev/null 2>&1
}

wait_tunnel() {
  until probe_tunnel; do
    echo "[chain r8] tunnel down $(date -u +%FT%TZ); retry in 5 min" >> "$LOG"
    sleep 300
  done
  echo "[chain r8] tunnel LIVE $(date -u +%FT%TZ)" >> "$LOG"
}

have() { [ -s "$1" ]; }

extract_json() {
  local log=$1 out=$2 rc=$3 prefix=${4:-}
  [ "$rc" -eq 0 ] || return 1
  grep -o "${prefix}{.*}" "$log" | tail -1 | sed "s/^${prefix}//" \
    | python -c 'import json,sys; d=sys.stdin.read(); json.loads(d); sys.stdout.write(d)' \
    > "$out".tmp 2>/dev/null && [ -s "$out".tmp ] && mv "$out".tmp "$out"
}

# 1. gate with both flags (numeric checks execute the dual/fold paths)
if ! have _chain/TPU_GATE_dualbwd.json; then
  wait_tunnel
  echo "[chain r8] gate dual+fold..." >> "$LOG"
  HPFG_DUAL_BWD=1 HPFG_FOLD_REDUCE=1 timeout 3600 \
    python scripts/tpu_gate.py > _chain/gate_dualbwd.log 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    cp TPU_GATE.json _chain/TPU_GATE_dualbwd.json
    git checkout -q TPU_GATE.json 2>/dev/null || true
  fi
  echo "[chain r8] gate rc=$rc: $(tail -1 _chain/gate_dualbwd.log)" >> "$LOG"
fi

bench_leg() {
  local name=$1; shift
  if ! have "_chain/bench_r04_${name}.json"; then
    wait_tunnel
    echo "[chain r8] bench ${name}..." >> "$LOG"
    env "$@" timeout 2400 python bench.py \
      > "_chain/bench_r04_${name}.log" 2>&1
    rc=$?
    extract_json "_chain/bench_r04_${name}.log" \
      "_chain/bench_r04_${name}.json" $rc
    echo "[chain r8] bench ${name} rc=$rc: $(cat _chain/bench_r04_${name}.json 2>/dev/null)" >> "$LOG"
  fi
}

# only bench the flags whose gate went green
gate_ok() {
  python -c "
import json,sys
try: d=json.load(open('_chain/TPU_GATE_dualbwd.json'))
except Exception: sys.exit(1)
sys.exit(0 if d.get('ok') else 1)"
}

bench_leg base HPFG_NOOP=0
if gate_ok; then
  bench_leg dual HPFG_DUAL_BWD=1
  bench_leg fold HPFG_FOLD_REDUCE=1
  bench_leg dualfold HPFG_DUAL_BWD=1 HPFG_FOLD_REDUCE=1
else
  echo "[chain r8] gate not green - skipping flag benches" >> "$LOG"
fi

# 6. BENCH_ALL (all 5 BASELINE configs, VERDICT #2) at current defaults
if ! have BENCH_ALL_r04.json; then
  wait_tunnel
  echo "[chain r8] bench_all..." >> "$LOG"
  timeout 7200 python -u bench_all.py > _chain/bench_all_r04.log 2>&1
  rc=$?
  echo "[chain r8] bench_all rc=$rc: $(tail -1 _chain/bench_all_r04.log)" >> "$LOG"
fi

# 7. transformer-family probe set (VERDICT #6)
if ! have BENCH_EXTRA_r04.json; then
  wait_tunnel
  echo "[chain r8] bench_extra..." >> "$LOG"
  HPFG_BENCH_SET=extra timeout 7200 python -u bench_all.py \
    > _chain/bench_extra_r04.log 2>&1
  rc=$?
  echo "[chain r8] bench_extra rc=$rc: $(tail -1 _chain/bench_extra_r04.log)" >> "$LOG"
fi

echo "[chain r8] chain r8 done $(date -u +%FT%TZ)" >> "$LOG"
