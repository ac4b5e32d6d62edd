#!/bin/bash
# Quiet-chip measurement pass: waits for every in-flight training
# (enh_tfg, queue2 incl. the VITS resume, queue3 ssl1) to drain, then
# runs the ablation profile (flagship + production-large scale) and the
# full bench on an uncontended chip. The 17:41 ABLATE attempt ran
# against four concurrent trainers and its sub-metrics were noise
# (frontend "slower" than the full step).
set -u
cd /root/repo

deadline=$(( $(date +%s) + 7*3600 ))
for pf in /tmp/enh_tfg.pid /tmp/r5_queue2.pid /tmp/r5_queue3.pid; do
  [ -f "$pf" ] || continue
  while kill -0 "$(cat "$pf")" 2>/dev/null; do
    [ "$(date +%s)" -ge "$deadline" ] && break 2
    sleep 60
  done
done
echo "=== measure start $(date +%H:%M:%S) ===" >> /tmp/r5_measure.log

timeout 2400 python -m espnet_tpu.bin.profile_ablate \
  --out docs/ABLATE_r05.json >> /tmp/r5_measure.log 2>&1
echo "=== ablate flagship exit=$? $(date +%H:%M:%S) ===" >> /tmp/r5_measure.log

timeout 2400 python -m espnet_tpu.bin.profile_ablate --scale large \
  --out docs/ABLATE_r05_large.json >> /tmp/r5_measure.log 2>&1
echo "=== ablate large exit=$? $(date +%H:%M:%S) ===" >> /tmp/r5_measure.log

timeout 2400 python bench.py > /tmp/bench_r5.json 2>/tmp/bench_r5.err
echo "=== bench exit=$? $(date +%H:%M:%S) ===" >> /tmp/r5_measure.log
echo "=== measure done $(date +%H:%M:%S) ===" >> /tmp/r5_measure.log
