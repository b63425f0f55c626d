#!/bin/bash
# Session-10 launcher: probe the TPU tunnel until it answers, then run
# chain_r5.sh (defaults validation + p4 shift A/B + outstanding artifacts).
# Persistent under the repo; everything idempotent — safe to relaunch after
# any host reboot: nohup bash _chain/launch_r6.sh & disown
set -u
cd /root/repo
D=/root/repo/_chain
LOG=$D/ab_results.log

say() { echo "[launch_r6 $(date +%H:%M:%S)] $*" >> "$LOG"; }

say "=== launcher r6 start (probing tunnel) ==="
n=0
while true; do
  n=$((n+1))
  timeout 1200 python - <<'EOF' >> "$LOG" 2>&1
import jax, time, numpy as np, jax.numpy as jnp
t0 = time.time()
d = jax.devices()
x = jnp.ones((8, 8))
s = float(np.asarray(x.sum()))
print(f"probe OK: {d} sum={s} in {time.time()-t0:.1f}s")
EOF
  rc=$?
  if [ $rc -eq 0 ]; then say "probe $n: TUNNEL UP"; break; fi
  say "probe $n: rc=$rc (down/stalled), sleeping 300s"
  sleep 300
done

bash $D/chain_r5.sh
say "=== launcher r6 done ==="
