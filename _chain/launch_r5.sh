#!/bin/bash
# Session-8 launcher: probe the TPU tunnel until it answers (cheap probe,
# generous timeout — post-reboot cold Executes have taken >900 s), then run
# chain_r4.sh followed by chain_r4b.sh. Persistent under the repo.
set -u
cd /root/repo
D=/root/repo/_chain
LOG=$D/ab_results.log

say() { echo "[launch_r5 $(date +%H:%M:%S)] $*" >> "$LOG"; }

say "=== launcher start (probing tunnel) ==="
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

bash $D/chain_r4.sh
bash $D/chain_r4b.sh
say "=== launcher done ==="
