#!/bin/bash
# Round-5 session-2 lane B: TF-GridNetV2 separation to >=10 dB SI-SNRi
# (VERDICT r4 item 3). B=8 x 4s OOM'd at 23G vs 15.75G HBM (BLSTM bwd
# residuals over B*T sequences); B=4 x 3s crop fits. Train bounded,
# then eval + asset regardless.
set -u
cd /root/repo
echo "=== enh_tfg lane start $(date +%H:%M:%S) ===" >> /tmp/enh_tfg.log
timeout 5100 python egs/synth_asr/enh1/run.py --stage 1 --stop_stage 2 \
  --separator tfgridnetv2 --max_epoch 60 --batch_size 4 --seconds 3.0 \
  --asset_dir /root/repo/assets/synth_enh_tfgridnet \
  >> /tmp/enh_tfg.log 2>&1
echo "=== enh train exit=$? $(date +%H:%M:%S) ===" >> /tmp/enh_tfg.log
timeout 1800 python egs/synth_asr/enh1/run.py --stage 3 --stop_stage 4 \
  --separator tfgridnetv2 --batch_size 4 --seconds 3.0 \
  --asset_dir /root/repo/assets/synth_enh_tfgridnet \
  >> /tmp/enh_tfg.log 2>&1
echo "=== enh eval exit=$? $(date +%H:%M:%S) ===" >> /tmp/enh_tfg.log
