#!/bin/bash
# A/B the head-reorder ALONE (LN back to fp32 stream, default): if >= 191.7
# (r4 ccnet_swinunet baseline) the reorder ships; else full revert.
cd /root/repo
L=_chain/sweep_r5h.log
echo "=== sweep_r5h start $(date)" >> $L
run() { echo "--- $1 $(date)" >> $L; sleep 30; timeout 3000 "${@:2}" >> $L 2>&1; echo "rc=$?" >> $L; }
run swin_reorder_only python -u _hpfg_ab.py swin_reorder_only ccnet_swinunet configs/ccnet_swinunet_30k_224x224_ACDC.yaml
echo "=== sweep_r5h done $(date)" >> $L
