#!/bin/bash
# eval-path A/B in the sustained context: 2x old per-model path vs the
# multi-path numbers already in SUS_off*.json (same tree, same probe).
cd /root/repo
L=_chain/sweep_r5m.log
echo "=== sweep_r5m start $(date)" >> $L
while ! grep -q "sweep_r5l done" _chain/sweep_r5l.log 2>/dev/null; do sleep 30; done
run() { echo "--- $1 $(date)" >> $L; sleep 20; timeout 3600 "${@:2}" >> $L 2>&1; echo "rc=$?" >> $L; }
for i in 1 2; do
  run sus_oldeval$i env HPFG_EVAL_MULTI=0 python -u _sustained_probe.py _chain/SUS_oldeval$i.json
done
grep -h img_per_s_steady _chain/SUS_oldeval*.json >> $L
echo "=== sweep_r5m done $(date)" >> $L
