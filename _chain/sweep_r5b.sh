#!/bin/bash
# Round-5 sweep B: re-run the two audits that hit FailedPrecondition when
# started <5 s after the previous TPU process (teardown overlap), then the
# eval-cost decomposition probe. 30 s guard between TPU jobs.
cd /root/repo
L=_chain/sweep_r5b.log
echo "=== sweep_r5b start $(date)" >> $L
run() { echo "--- $1 $(date)" >> $L; sleep 30; timeout 2400 "${@:2}" >> $L 2>&1; echo "rc=$?" >> $L; }

run uamt_audit python -u scripts/step_audit.py 10 configs/uncertainty_aware_unet_30k_224x224_ACDC.yaml
cp /tmp/step_audit.json _chain/step_audit_uamt.json 2>>$L
run swin_audit python -u scripts/step_audit.py 10 configs/ccnet_swinunet_30k_224x224_ACDC.yaml
cp /tmp/step_audit.json _chain/step_audit_swin.json 2>>$L
run eval_cost python -u _eval_cost_probe.py
echo "=== sweep_r5b done $(date)" >> $L
