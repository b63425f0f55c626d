#!/bin/bash
# Recovery chain r7 (recreated session-13; the session-12b original was lost
# to the 2026-08-20 container reset because it was never committed).
#
# Remaining round-3 validation queue at the 884.26 tree (8f13b4a):
#   1. bench.py re-confirm            -> _chain/bench_reconfirm_r13.json
#   2. SUSTAINED_r03c.json refresh    -> SUSTAINED_r03c.json (repo root)
#   3. hpfg 1500-iter soak            -> _chain/soak_hpfg_r12.json
#
# Idempotent: each step is skipped when its artifact already exists and is
# non-empty. Probes the tunnel every 5 min until live. ONE TPU job at a time.
# After any reboot:  nohup bash _chain/chain_r7.sh > /dev/null 2>&1 & disown
set -u
cd /root/repo
LOG=_chain/ab_results.log
echo "[chain r7] start $(date -u +%FT%TZ)" >> "$LOG"

probe_tunnel() {
  timeout 120 python -c "import jax; jax.devices()" > /dev/null 2>&1
}

wait_tunnel() {
  until probe_tunnel; do
    echo "[chain r7] tunnel down $(date -u +%FT%TZ); retry in 5 min" >> "$LOG"
    sleep 300
  done
  echo "[chain r7] tunnel LIVE $(date -u +%FT%TZ)" >> "$LOG"
}

have() { [ -s "$1" ]; }

# Write $2 from the last JSON line of $1 ONLY when rc ($3) is 0 AND the
# line parses as JSON (ADVICE r3: a failed run printing any brace line must
# not produce a bogus artifact that the idempotency guard then trusts).
extract_json() {
  local log=$1 out=$2 rc=$3 prefix=${4:-}
  [ "$rc" -eq 0 ] || return 1
  grep -o "${prefix}{.*}" "$log" | tail -1 | sed "s/^${prefix}//" \
    | python -c 'import json,sys; d=sys.stdin.read(); json.loads(d); sys.stdout.write(d)' \
    > "$out".tmp 2>/dev/null && [ -s "$out".tmp ] && mv "$out".tmp "$out"
}

# 1. bench re-confirm
if ! have _chain/bench_reconfirm_r13.json; then
  wait_tunnel
  echo "[chain r7] bench re-confirm..." >> "$LOG"
  timeout 3600 python bench.py > _chain/bench_reconfirm_r13.log 2>&1
  rc=$?
  extract_json _chain/bench_reconfirm_r13.log _chain/bench_reconfirm_r13.json $rc
  echo "[chain r7] bench rc=$rc: $(cat _chain/bench_reconfirm_r13.json 2>/dev/null)" >> "$LOG"
fi

# 2. SUSTAINED refresh (full Trainer loop, device_cache, 1500 iters)
if ! have SUSTAINED_r03c.json; then
  wait_tunnel
  echo "[chain r7] sustained refresh..." >> "$LOG"
  timeout 7200 python -u _sustained_probe.py SUSTAINED_r03c.json \
    > _chain/sustained_r03c.log 2>&1
  echo "[chain r7] sustained rc=$?: $(tail -c 400 SUSTAINED_r03c.json 2>/dev/null)" >> "$LOG"
fi

# 3. hpfg 1500-iter soak
if ! have _chain/soak_hpfg_r12.json; then
  wait_tunnel
  echo "[chain r7] hpfg soak..." >> "$LOG"
  timeout 7200 python -u _soak_run.py hpfg 1500 > _chain/soak_hpfg_r12.log 2>&1
  rc=$?
  extract_json _chain/soak_hpfg_r12.log _chain/soak_hpfg_r12.json $rc 'SOAK '
  echo "[chain r7] soak rc=$rc: $(cat _chain/soak_hpfg_r12.json 2>/dev/null)" >> "$LOG"
fi

echo "[chain r7] done $(date -u +%FT%TZ)" >> "$LOG"
