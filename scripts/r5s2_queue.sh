#!/bin/bash
# Round-5 session-2 lane C: the per-domain recipes that still have no
# committed asset (VERDICT r4 item 6): lm1, mt1, cls1, st1, svs1, ssl1.
# Each is bounded; failures don't block the rest.
set -u
cd /root/repo

run() {
  name=$1; t=$2; shift 2
  echo "=== queue: $name start $(date +%H:%M:%S) ===" >> /tmp/r5s2_queue.log
  timeout "$t" python "$@" > "/tmp/recipe_${name}.log" 2>&1
  echo "=== queue: $name exit=$? $(date +%H:%M:%S) ===" >> /tmp/r5s2_queue.log
}

run lm1  1800 egs/synth_asr/lm1/run.py
run mt1  2400 egs/synth_asr/mt1/run.py
run cls1 2400 egs/synth_asr/cls1/run.py
run st1  3000 egs/synth_asr/st1/run.py
run svs1 3000 egs/synth_asr/svs1/run.py
run ssl1 4800 egs/synth_asr/ssl1/run.py
echo "=== queue done $(date +%H:%M:%S) ===" >> /tmp/r5s2_queue.log
