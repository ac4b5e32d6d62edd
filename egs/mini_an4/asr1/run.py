#!/usr/bin/env python3
"""Canonical integration recipe: synthetic mini corpus, ASR end-to-end.

Python-first reimagining of the reference's egs2/mini_an4/asr1 + asr.sh
stage flow (data prep -> collect stats -> train -> decode -> score),
CPU-runnable. Stages select with --stage/--stop_stage like asr.sh.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
ROOT = HERE.parents[2]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=1)
    ap.add_argument("--stop_stage", type=int, default=5)
    ap.add_argument("--workdir", default=str(HERE / "work"))
    ap.add_argument("--max_epoch", type=int, default=12)
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"],
                    help="tiny integration corpus: CPU avoids per-dispatch "
                         "tunnel latency; use tpu for real corpora")
    args = ap.parse_args()
    work = Path(args.workdir)

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    data = work / "data"
    stats = work / "stats"
    exp = work / "exp" / "asr_transformer"
    decode_dir = work / "decode"

    cfg = {
        "token_list": str(data / "tokens.txt"),
        "token_type": "char",
        "frontend_conf": {"n_fft": 128, "hop_length": 64, "n_mels": 20,
                          "fs": 8000},
        "normalize": "utterance_mvn",
        "encoder": "transformer",
        "encoder_conf": {"output_size": 32, "attention_heads": 2,
                         "linear_units": 48, "num_blocks": 1,
                         "input_layer": "conv2d2"},
        "decoder": None,
        "model_conf": {"ctc_weight": 1.0},
        "optim_conf": {"lr": 0.05},
        "batch_type": "unsorted", "batch_size": 8,
        "max_epoch": args.max_epoch,
        "train_data_path_and_name_and_type": [
            f"{data}/train/wav.scp,speech,sound",
            f"{data}/train/text,text,text"],
        "valid_data_path_and_name_and_type": [
            f"{data}/valid/wav.scp,speech,sound",
            f"{data}/valid/text,text,text"],
    }

    if args.stage <= 1 <= args.stop_stage:
        print("=== stage 1: data preparation ===")
        from mini_corpus import make_corpus
        make_corpus(data, n_train=16, n_valid=4)

    if args.stage <= 2 <= args.stop_stage:
        print("=== stage 2: collect stats ===")
        from espnet_tpu.tasks.asr import ASRTask
        ASRTask.main(dict(cfg, output_dir=str(stats), collect_stats=True))

    if args.stage <= 3 <= args.stop_stage:
        print("=== stage 3: train ===")
        from espnet_tpu.tasks.asr import ASRTask
        ASRTask.main(dict(cfg, output_dir=str(exp)))

    if args.stage <= 4 <= args.stop_stage:
        print("=== stage 4: decode ===")
        from espnet_tpu.bin.asr_inference import inference
        model = next(exp.glob("valid.loss.ave_*best"), exp / "valid.loss.best")
        inference(output_dir=str(decode_dir),
                  data_path_and_name_and_type=[
                      f"{data}/valid/wav.scp,speech,sound"],
                  asr_train_config=exp / "config.yaml",
                  asr_model_file=model, batch_size=4, beam_size=1)

    if args.stage <= 5 <= args.stop_stage:
        print("=== stage 5: score ===")
        from espnet_tpu.data.fileio import read_2columns_text
        from espnet_tpu.utils.native import score_corpus
        refs = read_2columns_text(data / "valid" / "text")
        hyps = read_2columns_text(decode_dir / "1best_recog" / "text")
        keys = sorted(refs)
        result = score_corpus([refs[k] for k in keys],
                              [hyps.get(k, "") for k in keys], unit="char")
        print(f"CER: {result['err_rate']:.3f} "
              f"(S={result['sub']} D={result['del']} I={result['ins']} "
              f"N={result['ref_len']})")


if __name__ == "__main__":
    main()
