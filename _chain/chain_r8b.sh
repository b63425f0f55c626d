#!/bin/bash
# Round-4 chain r8b: runs AFTER chain r8 (waits for its done marker).
#   1. S4_SMOKE_r04 (1200-iter s4cvnet smoke past the MT gate, VERDICT #7)
#   2. SUSTAINED_r04 (overlapped-eval Trainer loop, VERDICT #3/#4) — waits
#      for _chain/DEFAULTS_SETTLED so it captures the FINAL dispatch
#      defaults after the A/B flip decision.
# After any reboot:  nohup bash _chain/chain_r8b.sh > /dev/null 2>&1 & disown
set -u
cd /root/repo
LOG=_chain/ab_results.log
echo "[chain r8b] start $(date -u +%FT%TZ)" >> "$LOG"

probe_tunnel() {
  timeout 180 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((8, 8)); float(np.asarray(x @ x)[0, 0])" > /dev/null 2>&1
}

wait_tunnel() {
  until probe_tunnel; do
    echo "[chain r8b] tunnel down $(date -u +%FT%TZ); retry in 5 min" >> "$LOG"
    sleep 300
  done
  echo "[chain r8b] tunnel LIVE $(date -u +%FT%TZ)" >> "$LOG"
}

have() { [ -s "$1" ]; }

# wait for chain r8 (one TPU job at a time)
until grep -q "chain r8 done" "$LOG"; do sleep 120; done

# 1. S4 smoke (flag-independent convergence artifact)
if ! have S4_SMOKE_r04.json; then
  wait_tunnel
  echo "[chain r8b] s4 smoke (1200 iters)..." >> "$LOG"
  timeout 7200 python -u _s4_train_probe.py > _chain/s4_smoke_r04.log 2>&1
  rc=$?
  echo "[chain r8b] s4 smoke rc=$rc: $(tail -1 _chain/s4_smoke_r04.log)" >> "$LOG"
fi

# 2. sustained at the settled defaults
until [ -f _chain/DEFAULTS_SETTLED ]; do sleep 120; done
if ! have SUSTAINED_r04.json; then
  wait_tunnel
  echo "[chain r8b] sustained r04..." >> "$LOG"
  timeout 7200 python -u _sustained_probe.py SUSTAINED_r04.json \
    > _chain/sustained_r04.log 2>&1
  rc=$?
  echo "[chain r8b] sustained rc=$rc: $(tail -c 400 SUSTAINED_r04.json 2>/dev/null)" >> "$LOG"
fi

echo "[chain r8b] chain r8b done $(date -u +%FT%TZ)" >> "$LOG"
