#!/bin/bash
# Round-5 follow-up queue (after soundfile->read_wav fix and OOM kill
# of the VITS resume): re-run the failed eval/recipe stages one at a
# time, then resume VITS 85->120 once the JETS job has exited and
# freed host RAM (the first resume was OOM-killed at 80 GB RSS with
# four concurrent trainers on a 125 GB host).
set -u
cd /root/repo

run() {
  name=$1; shift
  echo "=== queue2: $name start $(date +%H:%M:%S) ===" >> /tmp/r5_queue2.log
  timeout 9000 python "$@" >> "/tmp/recipe_${name}.log" 2>&1
  echo "=== queue2: $name exit=$? $(date +%H:%M:%S) ===" >> /tmp/r5_queue2.log
}

run diar1_eval egs/synth_asr/diar1/run.py --stage 3 --stop_stage 4
run lm1        egs/synth_asr/lm1/run.py
run st1        egs/synth_asr/st1/run.py

# VITS resume is the big-memory job: wait for JETS to exit first.
if [ -f /tmp/jets_r5.pid ]; then
  while kill -0 "$(cat /tmp/jets_r5.pid)" 2>/dev/null; do sleep 60; done
fi
run vits_r5 egs/synth_asr/tts1/run_vits.py --stage 2 --stop_stage 4 --max_epoch 120
echo "=== queue2 done $(date +%H:%M:%S) ===" >> /tmp/r5_queue2.log
