#!/usr/bin/env python3
"""Flagship training recipe: multi-speaker formant-synthesis corpus.

The LibriSpeech-class stand-in for this offline environment (VERDICT r1
next-step #1): data prep -> collect stats -> train the flagship Conformer
hybrid -> hybrid beam-search decode -> WER. The trained checkpoint is the
model bench.py decodes (natural hypothesis lengths, real WER).

Stages mirror egs2/TEMPLATE/asr1/asr.sh: 1 data, 2 stats, 3 train,
4 decode, 5 score, 6 export bench asset.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
ROOT = HERE.parents[2]
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=1)
    ap.add_argument("--stop_stage", type=int, default=6)
    ap.add_argument("--workdir", default=str(HERE / "work"))
    ap.add_argument("--n_train", type=int, default=2000)
    ap.add_argument("--n_valid", type=int, default=100)
    ap.add_argument("--max_epoch", type=int, default=40)
    ap.add_argument("--device", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--asset_dir", default=str(ROOT / "assets" /
                                               "synth_asr_flagship"))
    args = ap.parse_args()
    work = Path(args.workdir)

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:  # persistent XLA compile cache across stages/retries
        jax.config.update("jax_compilation_cache_dir",
                          str(work / "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    data = work / "data"
    stats = work / "stats"
    exp = work / "exp" / "asr_conformer"
    decode_dir = work / "decode"

    from espnet_tpu.data.synth_speech import SynthSpeechCorpus
    corpus = SynthSpeechCorpus()
    token_list = (["<blank>"] + corpus.char_vocab + ["<space>", "<sos/eos>"])

    cfg = {
        "token_list": str(data / "tokens.txt"),
        "token_type": "char",
        "frontend_conf": {"n_fft": 512, "hop_length": 128, "n_mels": 80},
        "specaug": "specaug",
        "specaug_conf": {"num_freq_mask": 2,
                         "freq_mask_width_range": (0, 10),
                         "num_time_mask": 2,
                         "time_mask_width_range": (0, 20)},
        "normalize": "global_mvn",
        "stats_file": str(stats / "train" / "feats_stats.npz"),
        "encoder": "conformer",
        "encoder_conf": {"output_size": 256, "attention_heads": 4,
                         "linear_units": 1024, "num_blocks": 6,
                         "cnn_module_kernel": 15},
        "decoder": "transformer",
        "decoder_conf": {"attention_heads": 4, "linear_units": 1024,
                         "num_blocks": 3},
        "model_conf": {"ctc_weight": 0.3, "lsm_weight": 0.1},
        "optim": "adam",
        "optim_conf": {"lr": 0.002},
        "scheduler": "warmuplr",
        "scheduler_conf": {"warmup_steps": 600},
        "grad_clip": 5.0,
        # ONE global padded shape (batch 25, speech 74656, text 64): the
        # whole run is a single XLA program — each fresh shape costs
        # minutes to compile through the axon tunnel, padded frames are
        # masked anyway
        "batch_type": "sorted",
        "batch_size": 25,
        "collate_fixed_lengths": {"speech": 74656, "text": 64},
        "max_epoch": args.max_epoch,
        "keep_nbest_models": 5,
        "patience": None,
        "log_interval": 20,
        "train_data_path_and_name_and_type": [
            f"{data}/train/wav.scp,speech,sound",
            f"{data}/train/text,text,text"],
        "valid_data_path_and_name_and_type": [
            f"{data}/valid/wav.scp,speech,sound",
            f"{data}/valid/text,text,text"],
        "train_shape_file": [f"{stats}/train/speech_shape"],
        "valid_shape_file": [f"{stats}/valid/speech_shape"],
    }

    if args.stage <= 1 <= args.stop_stage:
        print("=== stage 1: data preparation ===", flush=True)
        corpus.materialize(data, n_train=args.n_train, n_valid=args.n_valid,
                           n_test=0)
        data.mkdir(parents=True, exist_ok=True)
        (data / "tokens.txt").write_text(
            "\n".join(token_list) + "\n", encoding="utf-8")

    if args.stage <= 2 <= args.stop_stage:
        print("=== stage 2: collect stats ===", flush=True)
        from espnet_tpu.tasks.asr import ASRTask
        ASRTask.main(dict(cfg, output_dir=str(stats), collect_stats=True,
                          train_shape_file=[], valid_shape_file=[]))

    if args.stage <= 3 <= args.stop_stage:
        print("=== stage 3: train ===", flush=True)
        from espnet_tpu.tasks.asr import ASRTask
        ASRTask.main(dict(cfg, output_dir=str(exp)))

    if args.stage <= 4 <= args.stop_stage:
        print("=== stage 4: decode (hybrid beam search) ===", flush=True)
        from espnet_tpu.bin.asr_inference import inference
        model = next(exp.glob("valid.loss.ave_*best"),
                     exp / "valid.loss.best")
        inference(output_dir=str(decode_dir),
                  data_path_and_name_and_type=[
                      f"{data}/valid/wav.scp,speech,sound"],
                  asr_train_config=exp / "config.yaml",
                  asr_model_file=model, batch_size=8, beam_size=10,
                  ctc_weight=0.3)

    if args.stage <= 5 <= args.stop_stage:
        print("=== stage 5: score ===", flush=True)
        from espnet_tpu.data.fileio import read_2columns_text
        from espnet_tpu.utils.native import score_corpus
        refs = read_2columns_text(data / "valid" / "text")
        hyps = read_2columns_text(decode_dir / "1best_recog" / "text")
        keys = sorted(refs)
        wer = score_corpus([refs[k] for k in keys],
                           [hyps.get(k, "") for k in keys], unit="word")
        cer = score_corpus([refs[k] for k in keys],
                           [hyps.get(k, "") for k in keys], unit="char")
        print(f"WER: {wer['err_rate'] * 100:.2f}%  "
              f"(S={wer['sub']} D={wer['del']} I={wer['ins']} "
              f"N={wer['ref_len']})")
        print(f"CER: {cer['err_rate'] * 100:.2f}%")
        (work / "RESULTS.json").write_text(json.dumps(
            {"wer": wer["err_rate"], "cer": cer["err_rate"],
             "n_utts": len(keys)}))

    if args.stage <= 6 <= args.stop_stage:
        print("=== stage 6: export bench asset (fp16 checkpoint) ===",
              flush=True)
        import numpy as np

        from espnet_tpu.train.checkpoint import load_checkpoint
        asset = Path(args.asset_dir)
        asset.mkdir(parents=True, exist_ok=True)
        model = next(exp.glob("valid.loss.ave_*best"),
                     exp / "valid.loss.best")
        params, _, _ = load_checkpoint(model)
        import jax as _jax
        flat = {"/".join(map(str, k)): np.asarray(v)
                for k, v in _flatten(params).items()}
        comp = {k: (v.astype(np.float16) if v.dtype == np.float32 else v)
                for k, v in flat.items()}
        np.savez_compressed(asset / "params_f16.npz", **comp)
        import shutil
        shutil.copy(exp / "config.yaml", asset / "config.yaml")
        shutil.copy(data / "tokens.txt", asset / "tokens.txt")
        shutil.copy(cfg["stats_file"], asset / "feats_stats.npz")
        if (work / "RESULTS.json").exists():
            shutil.copy(work / "RESULTS.json", asset / "RESULTS.json")
        print("asset written to", asset)


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


if __name__ == "__main__":
    main()
