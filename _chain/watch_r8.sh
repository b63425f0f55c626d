#!/bin/bash
# Session-14 watcher v2: wait for the orphaned dual+fold gate (pid 30438),
# harvest its TPU_GATE.json, run the /verify recipe (mean_teacher CLI drive
# + uamt mc_mode=unroll drive — the surface changed this session), then
# relaunch chain_r8.sh for the serial benches.
set -u
cd /root/repo
LOG=_chain/ab_results.log
echo "[watch r8] waiting on orphan dual+fold gate pid 30438 $(date -u +%FT%TZ)" >> "$LOG"
while kill -0 30438 2>/dev/null; do sleep 20; done
if [ TPU_GATE.json -nt _chain/.gate_start_r8 ]; then
  ok=$(python -c "import json;print(json.load(open('TPU_GATE.json')).get('ok'))" 2>/dev/null)
  cp TPU_GATE.json _chain/TPU_GATE_dualbwd.json
  git checkout -q TPU_GATE.json 2>/dev/null || true
else
  ok=stale
fi
echo "[watch r8] orphan gate exited ok=$ok: $(tail -1 _chain/gate_dualbwd.log)" >> "$LOG"

# /verify leg 1: canonical mean_teacher CLI drive (recipe step 2)
echo "[watch r8] verify: mean_teacher drive..." >> "$LOG"
rm -rf /tmp/verify_run
timeout 2400 python -u scripts/run.py \
  --config configs/mean_teacher_unet_30k_224x224_ACDC.yaml \
  --set data_path=/tmp/verify_acdc --set save_path=/tmp/verify_run \
  --set label_num=0.25 --set total_itrs=30 --set step_size=15 \
  > _chain/verify_mt_s14.log 2>&1
rc1=$?
grep -q "done: 30 iters" _chain/verify_mt_s14.log && ls /tmp/verify_run/model/ > /dev/null 2>&1
pass1=$([ $rc1 -eq 0 ] && grep -q "done: 30 iters" _chain/verify_mt_s14.log && echo PASS || echo FAIL)
echo "[watch r8] verify mean_teacher rc=$rc1 $pass1: $(tail -1 _chain/verify_mt_s14.log)" >> "$LOG"

# /verify leg 2: uamt with the NEW mc_mode=unroll path (recipe step 3 variant)
echo "[watch r8] verify: uamt unroll drive..." >> "$LOG"
rm -rf /tmp/verify_run_uamt
timeout 2400 python -u scripts/run.py \
  --config configs/uncertainty_aware_unet_30k_224x224_ACDC.yaml \
  --set data_path=/tmp/verify_acdc --set save_path=/tmp/verify_run_uamt \
  --set label_num=0.25 --set total_itrs=30 --set step_size=15 \
  --set mc_mode=unroll --set mc_chunk=2 \
  > _chain/verify_uamt_s14.log 2>&1
rc2=$?
pass2=$([ $rc2 -eq 0 ] && grep -q "done: 30 iters" _chain/verify_uamt_s14.log && echo PASS || echo FAIL)
echo "[watch r8] verify uamt-unroll rc=$rc2 $pass2: $(tail -1 _chain/verify_uamt_s14.log)" >> "$LOG"

nohup bash _chain/chain_r8.sh > /dev/null 2>&1 &
echo $! > _chain/chain_r8.pid
echo "[watch r8] chain r8 relaunched pid $(cat _chain/chain_r8.pid)" >> "$LOG"
