#!/bin/bash
# Session-14 chain r10: the defaults-window work. Waits for chain r9's s4
# smoke to finish (TPU frees while r9 blocks on DEFAULTS_SETTLED), then:
#   1. bench.py at PURE defaults (no env) -> _chain/bench_r04_defaults.json
#      (headline; expect ~908 = dual+fold defaults)
#   2. _supervised_releg.py -> patches the 0.0 supervised row in BENCH_ALL_r04
#   3. /verify defaults drive (30-iter mean_teacher CLI run)
#   4. touch _chain/DEFAULTS_SETTLED  -> chain r9 runs SUSTAINED_r04
#   5. wait "chain r9 done" -> step_audit at the 908 state -> STEP_AUDIT_r04.json
# After any reboot:  nohup bash _chain/chain_r10.sh > /dev/null 2>&1 & disown
set -u
cd /root/repo
LOG=_chain/ab_results.log
echo "[chain r10] start $(date -u +%FT%TZ)" >> "$LOG"

probe_tunnel() {
  timeout 180 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((8, 8)); float(np.asarray(x @ x)[0, 0])" > /dev/null 2>&1
}
wait_tunnel() {
  until probe_tunnel; do
    echo "[chain r10] tunnel down $(date -u +%FT%TZ); retry in 5 min" >> "$LOG"
    sleep 300
  done
}
have() { [ -s "$1" ]; }
extract_json() {
  local log=$1 out=$2 rc=$3
  [ "$rc" -eq 0 ] || return 1
  grep -o '{.*}' "$log" | tail -1 \
    | python -c 'import json,sys; d=sys.stdin.read(); json.loads(d); sys.stdout.write(d)' \
    > "$out".tmp 2>/dev/null && [ -s "$out".tmp ] && mv "$out".tmp "$out"
}

# wait for r9's s4 smoke to have logged (it then blocks on DEFAULTS_SETTLED)
until grep -q "s4 smoke rc=" "$LOG"; do sleep 60; done

# 1. headline bench at pure defaults
if ! have _chain/bench_r04_defaults.json; then
  wait_tunnel
  echo "[chain r10] bench defaults..." >> "$LOG"
  timeout 2400 python bench.py > _chain/bench_r04_defaults.log 2>&1
  rc=$?
  extract_json _chain/bench_r04_defaults.log _chain/bench_r04_defaults.json $rc
  echo "[chain r10] bench defaults rc=$rc: $(cat _chain/bench_r04_defaults.json 2>/dev/null)" >> "$LOG"
fi

# 2. supervised re-leg (patches BENCH_ALL_r04.json in place)
if python -c "
import json,sys
rows=json.load(open('BENCH_ALL_r04.json'))['rows']
sys.exit(0 if any(r['value']==0.0 for r in rows) else 1)"; then
  wait_tunnel
  echo "[chain r10] supervised re-leg..." >> "$LOG"
  timeout 2400 python -u _supervised_releg.py > _chain/supervised_releg.log 2>&1
  rc=$?
  echo "[chain r10] supervised re-leg rc=$rc: $(tail -1 _chain/supervised_releg.log)" >> "$LOG"
fi

# 3. /verify defaults drive
if ! grep -q "done: 30 iters" _chain/verify_defaults_s14.log 2>/dev/null; then
  wait_tunnel
  echo "[chain r10] verify defaults drive..." >> "$LOG"
  rm -rf /tmp/verify_run_defaults
  timeout 2400 python -u scripts/run.py \
    --config configs/mean_teacher_unet_30k_224x224_ACDC.yaml \
    --set data_path=/tmp/verify_acdc --set save_path=/tmp/verify_run_defaults \
    --set label_num=0.25 --set total_itrs=30 --set step_size=15 \
    > _chain/verify_defaults_s14.log 2>&1
  rc=$?
  pass=$([ $rc -eq 0 ] && grep -q "done: 30 iters" _chain/verify_defaults_s14.log && echo PASS || echo FAIL)
  echo "[chain r10] verify defaults rc=$rc $pass: $(tail -1 _chain/verify_defaults_s14.log)" >> "$LOG"
fi

# 4. release chain r9's sustained leg
touch _chain/DEFAULTS_SETTLED
echo "[chain r10] DEFAULTS_SETTLED touched $(date -u +%FT%TZ)" >> "$LOG"

# 5. step audit at the settled state (after r9 finishes sustained)
until grep -q "chain r9 done" "$LOG"; do sleep 60; done
if ! have STEP_AUDIT_r04.json; then
  wait_tunnel
  echo "[chain r10] step_audit..." >> "$LOG"
  timeout 1800 python -u scripts/step_audit.py 10 > _chain/step_audit_r04.log 2>&1
  rc=$?
  if [ $rc -eq 0 ] && [ -s /tmp/step_audit.json ]; then
    cp /tmp/step_audit.json STEP_AUDIT_r04.json
  fi
  echo "[chain r10] step_audit rc=$rc" >> "$LOG"
fi
echo "[chain r10] chain r10 done $(date -u +%FT%TZ)" >> "$LOG"
