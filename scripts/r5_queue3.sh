#!/bin/bash
# ssl1 re-run after the hubert feature-pass fix; waits for queue1
# (ssl1 timeout-kill + svs1) to drain first.
set -u
cd /root/repo
if [ -f /tmp/r5_queue.pid ]; then
  while kill -0 "$(cat /tmp/r5_queue.pid)" 2>/dev/null; do sleep 60; done
fi
echo "=== queue3: ssl1 start $(date +%H:%M:%S) ===" >> /tmp/r5_queue3.log
timeout 7200 python egs/synth_asr/ssl1/run.py > /tmp/recipe_ssl1_b.log 2>&1
echo "=== queue3: ssl1 exit=$? $(date +%H:%M:%S) ===" >> /tmp/r5_queue3.log
