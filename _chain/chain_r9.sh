#!/bin/bash
# Round-4 chain r9: strictly-serialized continuation after chain r8
# (replaces r8b; waits for r8's done marker so only ONE TPU job runs).
#   1. gate packrw (+dual+fold)        -> _chain/TPU_GATE_packrw.json
#   2. bench packrw                    -> _chain/bench_r04_packrw.json
#   3. bench packrw+dual+fold          -> _chain/bench_r04_packrw_all.json
#   4. S4_SMOKE_r04 (1200-iter smoke)  -> S4_SMOKE_r04.json
#   5. (waits for _chain/DEFAULTS_SETTLED) SUSTAINED_r04 at final defaults
# After any reboot:  nohup bash _chain/chain_r9.sh > /dev/null 2>&1 & disown
set -u
cd /root/repo
LOG=_chain/ab_results.log
echo "[chain r9] start $(date -u +%FT%TZ)" >> "$LOG"

probe_tunnel() {
  timeout 180 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((8, 8)); float(np.asarray(x @ x)[0, 0])" > /dev/null 2>&1
}

wait_tunnel() {
  until probe_tunnel; do
    echo "[chain r9] tunnel down $(date -u +%FT%TZ); retry in 5 min" >> "$LOG"
    sleep 300
  done
  echo "[chain r9] tunnel LIVE $(date -u +%FT%TZ)" >> "$LOG"
}

have() { [ -s "$1" ]; }

extract_json() {
  local log=$1 out=$2 rc=$3 prefix=${4:-}
  [ "$rc" -eq 0 ] || return 1
  grep -o "${prefix}{.*}" "$log" | tail -1 | sed "s/^${prefix}//" \
    | python -c 'import json,sys; d=sys.stdin.read(); json.loads(d); sys.stdout.write(d)' \
    > "$out".tmp 2>/dev/null && [ -s "$out".tmp ] && mv "$out".tmp "$out"
}

# serialize behind chain r8
until grep -q "chain r8 done" "$LOG"; do sleep 120; done

# 1. packrw gate (with the bwd folds on too — the full candidate stack)
if ! have _chain/TPU_GATE_packrw.json; then
  wait_tunnel
  echo "[chain r9] gate packrw..." >> "$LOG"
  HPFG_IM2COL=packrw HPFG_DUAL_BWD=1 HPFG_FOLD_REDUCE=1 timeout 3600 \
    python scripts/tpu_gate.py > _chain/gate_packrw.log 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    cp TPU_GATE.json _chain/TPU_GATE_packrw.json
    git checkout -q TPU_GATE.json 2>/dev/null || true
  fi
  echo "[chain r9] gate packrw rc=$rc: $(tail -1 _chain/gate_packrw.log)" >> "$LOG"
fi

packrw_gate_ok() {
  python -c "
import json,sys
try: d=json.load(open('_chain/TPU_GATE_packrw.json'))
except Exception: sys.exit(1)
sys.exit(0 if d.get('ok') else 1)"
}

bench_leg() {
  local name=$1; shift
  if ! have "_chain/bench_r04_${name}.json"; then
    wait_tunnel
    echo "[chain r9] bench ${name}..." >> "$LOG"
    env "$@" timeout 2400 python bench.py \
      > "_chain/bench_r04_${name}.log" 2>&1
    rc=$?
    extract_json "_chain/bench_r04_${name}.log" \
      "_chain/bench_r04_${name}.json" $rc
    echo "[chain r9] bench ${name} rc=$rc: $(cat _chain/bench_r04_${name}.json 2>/dev/null)" >> "$LOG"
  fi
}

if packrw_gate_ok; then
  bench_leg packrw HPFG_IM2COL=packrw
  bench_leg packrw_all HPFG_IM2COL=packrw HPFG_DUAL_BWD=1 HPFG_FOLD_REDUCE=1
else
  echo "[chain r9] packrw gate not green - skipping its benches" >> "$LOG"
fi

# 4. S4 smoke (flag-independent convergence artifact)
if ! have S4_SMOKE_r04.json; then
  wait_tunnel
  echo "[chain r9] s4 smoke (1200 iters)..." >> "$LOG"
  timeout 7200 python -u _s4_train_probe.py > _chain/s4_smoke_r04.log 2>&1
  rc=$?
  echo "[chain r9] s4 smoke rc=$rc: $(tail -1 _chain/s4_smoke_r04.log)" >> "$LOG"
fi

# 5. sustained at the settled defaults
until [ -f _chain/DEFAULTS_SETTLED ]; do sleep 120; done
if ! have SUSTAINED_r04.json; then
  wait_tunnel
  echo "[chain r9] sustained r04..." >> "$LOG"
  timeout 7200 python -u _sustained_probe.py SUSTAINED_r04.json \
    > _chain/sustained_r04.log 2>&1
  rc=$?
  echo "[chain r9] sustained rc=$rc: $(tail -c 400 SUSTAINED_r04.json 2>/dev/null)" >> "$LOG"
fi

echo "[chain r9] chain r9 done $(date -u +%FT%TZ)" >> "$LOG"
