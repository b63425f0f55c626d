#!/bin/bash
# Round-5 sweep D (after r5c): TPU gate at the new tree (swin LN/head-reorder +
# multi-eval), then verify-recipe CLI drives: mean_teacher (exercises the new
# evaluate_volumes_multi boundary path) and ccnet_swinunet (the changed model).
cd /root/repo
L=_chain/sweep_r5d.log
echo "=== sweep_r5d start $(date)" >> $L
while ! grep -q "sweep_r5c done" _chain/sweep_r5c.log 2>/dev/null; do sleep 30; done
run() { echo "--- $1 $(date)" >> $L; sleep 30; timeout 3000 "${@:2}" >> $L 2>&1; echo "rc=$?" >> $L; }

run tpu_gate python -u scripts/tpu_gate.py
run verify_mt python -u scripts/run.py --config configs/mean_teacher_unet_30k_224x224_ACDC.yaml --set data_path=/tmp/verify_acdc --set save_path=/tmp/verify_run2 --set label_num=0.25 --set total_itrs=30 --set step_size=15
run verify_swin python -u scripts/run.py --config configs/ccnet_swinunet_30k_224x224_ACDC.yaml --set data_path=/tmp/verify_acdc --set save_path=/tmp/verify_swin --set label_num=0.25 --set total_itrs=20 --set step_size=10
echo "=== sweep_r5d done $(date)" >> $L
