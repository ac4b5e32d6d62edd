#!/bin/bash
# Round-5 session-2 lane A: VITS warm-started from the committed asset
# (work-dir checkpoints were lost to a host reboot), 60 more epochs,
# then the ns-sweep eval + asset export. Bounded so stages 3-4 always
# run even if stage 2 hits the timeout (per-epoch checkpoints exist).
set -u
cd /root/repo
echo "=== vits lane start $(date +%H:%M:%S) ===" >> /tmp/vits_r5.log
timeout 4500 python egs/synth_asr/tts1/run_vits.py --stage 1 --stop_stage 2 \
  --max_epoch 60 --init_from assets/synth_tts_vits >> /tmp/vits_r5.log 2>&1
echo "=== vits train exit=$? $(date +%H:%M:%S) ===" >> /tmp/vits_r5.log
timeout 2100 python egs/synth_asr/tts1/run_vits.py --stage 3 --stop_stage 4 \
  >> /tmp/vits_r5.log 2>&1
echo "=== vits eval exit=$? $(date +%H:%M:%S) ===" >> /tmp/vits_r5.log
