#!/bin/bash
# Round-5 sweep C (after eval-cost probe finishes): swin LN/head-reorder bench
# legs, then a short real-CLI training drive of the swin config (verify recipe).
cd /root/repo
L=_chain/sweep_r5c.log
echo "=== sweep_r5c start $(date)" >> $L
# wait for the eval-cost probe to release the TPU
while ! grep -q "^rc=" /tmp/evalcost2.log 2>/dev/null; do sleep 20; done
run() { echo "--- $1 $(date)" >> $L; sleep 30; timeout 2400 "${@:2}" >> $L 2>&1; echo "rc=$?" >> $L; }

run swin_bench python -u _hpfg_ab.py swin_lnfix ccnet_swinunet configs/ccnet_swinunet_30k_224x224_ACDC.yaml
run swinlidc_bench python -u _hpfg_ab.py swinlidc_lnfix swinunet_lidc configs/swinunet_30k_96x96_LIDC.yaml
run swin_audit2 python -u scripts/step_audit.py 10 configs/ccnet_swinunet_30k_224x224_ACDC.yaml
cp /tmp/step_audit.json _chain/step_audit_swin_lnfix.json 2>>$L
echo "=== sweep_r5c done $(date)" >> $L
