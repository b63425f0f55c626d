#!/bin/bash
cd /root/repo
L=_chain/sweep_r5k.log
echo "=== sweep_r5k start $(date)" >> $L
run() { echo "--- $1 $(date)" >> $L; sleep 20; timeout 3600 "${@:2}" >> $L 2>&1; echo "rc=$?" >> $L; }
run sustained python -u _sustained_probe.py SUSTAINED_r05.json
run verify_mt python -u scripts/run.py --config configs/mean_teacher_unet_30k_224x224_ACDC.yaml --set data_path=/tmp/verify_acdc --set save_path=/tmp/verify_run3 --set label_num=0.25 --set total_itrs=30 --set step_size=15
echo "=== sweep_r5k done $(date)" >> $L
