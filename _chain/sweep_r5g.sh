#!/bin/bash
cd /root/repo
L=_chain/sweep_r5g.log
echo "=== sweep_r5g start $(date)" >> $L
run() { echo "--- $1 $(date)" >> $L; sleep 30; timeout 3000 "${@:2}" >> $L 2>&1; echo "rc=$?" >> $L; }
run swin_audit4 python -u scripts/step_audit.py 10 configs/ccnet_swinunet_30k_224x224_ACDC.yaml
cp /tmp/step_audit.json _chain/step_audit_swin_lnfix2.json 2>>$L
run swin_bench3 python -u _hpfg_ab.py swin_lnfix2 ccnet_swinunet configs/ccnet_swinunet_30k_224x224_ACDC.yaml
echo "=== sweep_r5g done $(date)" >> $L
