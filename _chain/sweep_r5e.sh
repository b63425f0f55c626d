#!/bin/bash
# Round-5 sweep E: validate the corrected swin LN-downcast + head-reorder tree.
# Order: audit (device-time attribution) -> clean bench legs (idle host!) ->
# tpu_gate -> verify CLI drives (mean_teacher exercises evaluate_volumes_multi).
cd /root/repo
L=_chain/sweep_r5e.log
echo "=== sweep_r5e start $(date)" >> $L
run() { echo "--- $1 $(date)" >> $L; sleep 30; timeout 3000 "${@:2}" >> $L 2>&1; echo "rc=$?" >> $L; }

run swin_audit3 python -u scripts/step_audit.py 10 configs/ccnet_swinunet_30k_224x224_ACDC.yaml
cp /tmp/step_audit.json _chain/step_audit_swin_lnfix2.json 2>>$L
run swin_bench2 python -u _hpfg_ab.py swin_lnfix2 ccnet_swinunet configs/ccnet_swinunet_30k_224x224_ACDC.yaml
run swinlidc_bench2 python -u _hpfg_ab.py swinlidc_lnfix2 swinunet_lidc configs/swinunet_30k_96x96_LIDC.yaml
run tpu_gate python -u scripts/tpu_gate.py
run verify_mt python -u scripts/run.py --config configs/mean_teacher_unet_30k_224x224_ACDC.yaml --set data_path=/tmp/verify_acdc --set save_path=/tmp/verify_run2 --set label_num=0.25 --set total_itrs=30 --set step_size=15
run verify_swin python -u scripts/run.py --config configs/ccnet_swinunet_30k_224x224_ACDC.yaml --set data_path=/tmp/verify_acdc --set save_path=/tmp/verify_swin --set label_num=0.25 --set total_itrs=20 --set step_size=10
echo "=== sweep_r5e done $(date)" >> $L
