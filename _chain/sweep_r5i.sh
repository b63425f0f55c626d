#!/bin/bash
# Round-5 artifacts: SUSTAINED_r05 (multi-eval boundary fix), headline bench,
# BENCH_ALL_r05, BENCH_EXTRA_r05 (all rows now carry step FLOPs + MFU).
cd /root/repo
L=_chain/sweep_r5i.log
echo "=== sweep_r5i start $(date)" >> $L
run() { echo "--- $1 $(date)" >> $L; sleep 30; timeout 7200 "${@:2}" >> $L 2>&1; echo "rc=$?" >> $L; }
run sustained python -u _sustained_probe.py SUSTAINED_r05.json
run bench python -u bench.py
cp /dev/null /dev/null
run bench_all python -u bench_all.py
run bench_extra env HPFG_BENCH_SET=extra python -u bench_all.py
echo "=== sweep_r5i done $(date)" >> $L
