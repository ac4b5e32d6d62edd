#!/bin/bash
# Session-4 queue continuation (mt1/st1/svs1). Lesson from lm1 this
# session: a timeout that kills stage 2 mid-train banks nothing, so each
# recipe gets (a) reduced --max_epoch sized for a contended chip and
# (b) an unconditional stage>=3 eval pass afterwards so the best
# checkpoint always gets scored + exported.
set -u
cd /root/repo

run_one() {  # name budget_full budget_eval epochs
  name=$1; bfull=$2; beval=$3; ep=$4
  echo "=== q2: $name full start $(date +%H:%M:%S) ===" >> /tmp/r5s4_queue.log
  timeout "$bfull" python "egs/synth_asr/$name/run.py" --max_epoch "$ep" \
    > "/tmp/recipe_$name.log" 2>&1
  rc=$?
  echo "=== q2: $name full exit=$rc $(date +%H:%M:%S) ===" >> /tmp/r5s4_queue.log
  if [ "$rc" -ne 0 ]; then
    echo "=== q2: $name eval-only start ===" >> /tmp/r5s4_queue.log
    timeout "$beval" python "egs/synth_asr/$name/run.py" --stage 3 \
      >> "/tmp/recipe_$name.log" 2>&1
    echo "=== q2: $name eval exit=$? $(date +%H:%M:%S) ===" >> /tmp/r5s4_queue.log
  fi
}

# wait for cls1's slot to free (it has its own 600s timeout)
while pgrep -x python >/dev/null 2>&1 && ps aux | grep -v grep | grep -q "cls1/run.py"; do sleep 10; done

run_one mt1 400 200 12
run_one st1 460 200 10
run_one svs1 460 200 15
