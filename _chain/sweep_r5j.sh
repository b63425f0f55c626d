#!/bin/bash
cd /root/repo
L=_chain/sweep_r5j.log
echo "=== sweep_r5j start $(date)" >> $L
while ! grep -q "sweep_r5i done" _chain/sweep_r5i.log 2>/dev/null; do sleep 30; done
sleep 30
echo "--- eval_ab $(date)" >> $L
timeout 3600 python -u _eval_ab_probe.py >> $L 2>&1
echo "rc=$?" >> $L
echo "=== sweep_r5j done $(date)" >> $L
