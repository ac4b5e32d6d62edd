#!/bin/bash
# Round-5 recipe queue: runs the remaining per-domain recipes one at a
# time (single host core; TPU multiplexes). Each writes RESULTS.json +
# an asset via its own stages. Waits for the speechlm run (pid file) to
# exit first.
set -u
cd /root/repo

if [ -f /tmp/speechlm.pid ]; then
  while kill -0 "$(cat /tmp/speechlm.pid)" 2>/dev/null; do sleep 30; done
fi

run() {
  name=$1; shift
  echo "=== queue: $name start $(date +%H:%M:%S) ===" >> /tmp/r5_queue.log
  timeout 4200 python "$@" >> "/tmp/recipe_${name}.log" 2>&1
  echo "=== queue: $name exit=$? $(date +%H:%M:%S) ===" >> /tmp/r5_queue.log
}

run lm1   egs/synth_asr/lm1/run.py
run st1   egs/synth_asr/st1/run.py
run codec1 egs/synth_asr/codec1/run.py
run diar1 egs/synth_asr/diar1/run.py
run ssl1  egs/synth_asr/ssl1/run.py
run svs1  egs/synth_asr/svs1/run.py
echo "=== queue done $(date +%H:%M:%S) ===" >> /tmp/r5_queue.log
