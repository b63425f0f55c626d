#!/bin/bash
# Sustained variance study: 3x pack-off vs 3x pack-on, idle host.
cd /root/repo
L=_chain/sweep_r5l.log
echo "=== sweep_r5l start $(date)" >> $L
while ! grep -q "sweep_r5k done" _chain/sweep_r5k.log 2>/dev/null; do sleep 30; done
run() { echo "--- $1 $(date)" >> $L; sleep 20; timeout 3600 "${@:2}" >> $L 2>&1; echo "rc=$?" >> $L; }
for i in 1 2 3; do
  run sus_off$i env HPFG_CKPT_PACK=0 python -u _sustained_probe.py _chain/SUS_off$i.json
done
for i in 1 2 3; do
  run sus_on$i env HPFG_CKPT_PACK=1 python -u _sustained_probe.py _chain/SUS_on$i.json
done
grep -h img_per_s_steady _chain/SUS_off*.json _chain/SUS_on*.json >> $L
echo "=== sweep_r5l done $(date)" >> $L
