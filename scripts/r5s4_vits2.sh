#!/bin/bash
# Session-4 VITS relaunch: first attempt burned its whole timebox on the
# cold GAN compile (3 concurrent lanes); the persistent jax_cache from
# that attempt makes this one start training immediately. Eval+asset
# always run afterwards on whatever checkpoint landed.
set -u
cd /root/repo
echo "=== vits2 train start $(date +%H:%M:%S) ===" >> /tmp/vits_r5.log
timeout 840 python egs/synth_asr/tts1/run_vits.py --stage 2 --stop_stage 2 \
  --max_epoch 30 --init_from assets/synth_tts_vits >> /tmp/vits_r5.log 2>&1
echo "=== vits2 train exit=$? $(date +%H:%M:%S) ===" >> /tmp/vits_r5.log
timeout 540 python egs/synth_asr/tts1/run_vits.py --stage 3 --stop_stage 4 \
  >> /tmp/vits_r5.log 2>&1
echo "=== vits2 eval exit=$? $(date +%H:%M:%S) ===" >> /tmp/vits_r5.log
