#!/bin/bash
# Round-5 session-4 lanes (host rebooted; session-3 lane results never
# landed). ~55 min wall budget this session, so every stage is
# time-boxed tighter than s3 and eval+asset ALWAYS run.
#   A: VITS warm-start from committed 44.9%-WER asset  (VERDICT r4 #2)
#   B: TF-GridNetV2 separation train->eval->asset      (VERDICT r4 #3)
#   C: per-domain recipe queue, missing assets only    (VERDICT r4 #6)
set -u
cd /root/repo

lane_a() {
  echo "=== vits train start $(date +%H:%M:%S) ===" >> /tmp/vits_r5.log
  timeout 1080 python egs/synth_asr/tts1/run_vits.py --stage 1 --stop_stage 2 \
    --max_epoch 40 --init_from assets/synth_tts_vits >> /tmp/vits_r5.log 2>&1
  echo "=== vits train exit=$? $(date +%H:%M:%S) ===" >> /tmp/vits_r5.log
  timeout 600 python egs/synth_asr/tts1/run_vits.py --stage 3 --stop_stage 4 \
    >> /tmp/vits_r5.log 2>&1
  echo "=== vits eval exit=$? $(date +%H:%M:%S) ===" >> /tmp/vits_r5.log
}

lane_b() {
  echo "=== enh_tfg train start $(date +%H:%M:%S) ===" >> /tmp/enh_tfg.log
  timeout 1080 python egs/synth_asr/enh1/run.py --stage 1 --stop_stage 2 \
    --separator tfgridnetv2 --max_epoch 40 --batch_size 4 --seconds 3.0 \
    --asset_dir /root/repo/assets/synth_enh_tfgridnet >> /tmp/enh_tfg.log 2>&1
  echo "=== enh train exit=$? $(date +%H:%M:%S) ===" >> /tmp/enh_tfg.log
  timeout 600 python egs/synth_asr/enh1/run.py --stage 3 --stop_stage 4 \
    --separator tfgridnetv2 --batch_size 4 --seconds 3.0 \
    --asset_dir /root/repo/assets/synth_enh_tfgridnet >> /tmp/enh_tfg.log 2>&1
  echo "=== enh eval exit=$? $(date +%H:%M:%S) ===" >> /tmp/enh_tfg.log
}

lane_c() {
  for spec in "lm1 700" "cls1 600" "mt1 600" "st1 700" "svs1 700" "ssl1 900"; do
    set -- $spec
    echo "=== queue: $1 start $(date +%H:%M:%S) ===" >> /tmp/r5s4_queue.log
    timeout "$2" python "egs/synth_asr/$1/run.py" > "/tmp/recipe_$1.log" 2>&1
    echo "=== queue: $1 exit=$? $(date +%H:%M:%S) ===" >> /tmp/r5s4_queue.log
  done
}

case "${1:-all}" in
  a) lane_a ;;
  b) lane_b ;;
  c) lane_c ;;
esac
