#!/bin/bash
# Round-5 sweep A: HPFG dispatch A/Bs, then UAMT + swinunet audits, then gap probe.
# ONE TPU job at a time; all output under _chain/ (survives reboots).
cd /root/repo
L=_chain/sweep_r5a.log
echo "=== sweep_r5a start $(date)" >> $L
run() { echo "--- $1 $(date)" >> $L; timeout 2400 "${@:2}" >> $L 2>&1; echo "rc=$?" >> $L; }

run hpfg_default python -u _hpfg_ab.py default
run hpfg_halves  env HPFG_POOL=halves python -u _hpfg_ab.py halves
run hpfg_maskgrad env HPFG_POOL=maskgrad python -u _hpfg_ab.py maskgrad
run hpfg_minw56  env HPFG_FUSED_MINW=56 python -u _hpfg_ab.py minw56
run uamt_audit python -u scripts/step_audit.py 10 configs/uncertainty_aware_unet_30k_224x224_ACDC.yaml
cp /tmp/step_audit.json _chain/step_audit_uamt.json 2>>$L
run swin_audit python -u scripts/step_audit.py 10 configs/ccnet_swinunet_30k_224x224_ACDC.yaml
cp /tmp/step_audit.json _chain/step_audit_swin.json 2>>$L
run gap_probe python -u _gap_probe.py GAP_PROBE_r05.json
echo "=== sweep_r5a done $(date)" >> $L
