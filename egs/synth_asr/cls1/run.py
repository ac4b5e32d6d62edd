#!/usr/bin/env python3
"""Audio-classification recipe (keyword classification).

The cls1 stand-in for this offline environment (reference task:
espnet2/cls + egs2 cls1, e.g. keyword/audio-event tagging): each
utterance is a SINGLE word drawn from a 30-word lexicon, spoken by a
random synthetic speaker with noise — a Speech-Commands-style closed
keyword set. The model is the ClassificationTask transformer encoder
with masked mean pooling; headline metric is top-1 accuracy on a
held-out test split.

Stages: 1 data (single-word wavs + integer labels), 2 train
(ClassificationTask), 3 eval accuracy, 4 export asset.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
ROOT = HERE.parents[2]
sys.path.insert(0, str(ROOT))

N_KEYWORDS = 30


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=1)
    ap.add_argument("--stop_stage", type=int, default=4)
    ap.add_argument("--workdir", default=str(HERE / "work"))
    ap.add_argument("--n_train", type=int, default=1500)
    ap.add_argument("--n_valid", type=int, default=100)
    ap.add_argument("--n_test", type=int, default=200)
    ap.add_argument("--max_epoch", type=int, default=15)
    ap.add_argument("--device", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--asset_dir", default=str(ROOT / "assets" /
                                               "synth_cls"))
    args = ap.parse_args()
    work = Path(args.workdir)
    data = work / "data"
    exp = work / "exp" / "cls"

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(work / "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from espnet_tpu.data.synth_speech import SynthSpeechCorpus
    corpus = SynthSpeechCorpus(n_words=N_KEYWORDS, min_words=1, max_words=1)
    word2id = {w: i for i, w in enumerate(corpus.words)}

    cfg = {
        "n_classes": N_KEYWORDS,
        "frontend_conf": {"n_fft": 512, "hop_length": 128, "n_mels": 80},
        "encoder": "transformer",
        "encoder_conf": {"output_size": 144, "attention_heads": 4,
                         "linear_units": 576, "num_blocks": 4,
                         "input_layer": "conv2d"},
        "optim": "adam",
        "optim_conf": {"lr": 1e-3},
        "scheduler": "warmuplr",
        "scheduler_conf": {"warmup_steps": 300},
        "grad_clip": 5.0,
        "batch_type": "unsorted", "batch_size": 32,
        "max_epoch": args.max_epoch,
        "keep_nbest_models": 2,
        "patience": None,
        "log_interval": 20,
        "steps_per_dispatch": 4,
        "resume": True,
        "train_data_path_and_name_and_type": [
            f"{data}/train/wav.scp,speech,sound",
            f"{data}/train/label,label,text_int"],
        "valid_data_path_and_name_and_type": [
            f"{data}/valid/wav.scp,speech,sound",
            f"{data}/valid/label,label,text_int"],
        "train_shape_file": [f"{data}/train/speech_shape"],
        "valid_shape_file": [f"{data}/valid/speech_shape"],
    }

    if args.stage <= 1 <= args.stop_stage:
        print("=== stage 1: single-keyword wavs + labels ===", flush=True)
        from espnet_tpu.data.fileio import write_wav
        for split, n in (("train", args.n_train), ("valid", args.n_valid),
                         ("test", args.n_test)):
            d = data / split
            (d / "wav").mkdir(parents=True, exist_ok=True)
            with open(d / "wav.scp", "w") as fw, \
                    open(d / "label", "w") as fl, \
                    open(d / "speech_shape", "w") as fs:
                for i in range(n):
                    wave, text, _ = corpus.utterance(f"cls-{split}", i)
                    uid = f"{split}_{i:05d}"
                    write_wav(d / "wav" / f"{uid}.wav", 16000, wave)
                    fw.write(f"{uid} {d / 'wav' / f'{uid}.wav'}\n")
                    fl.write(f"{uid} {word2id[text]}\n")
                    fs.write(f"{uid} {len(wave)}\n")

    if args.stage <= 2 <= args.stop_stage:
        print("=== stage 2: train classifier ===", flush=True)
        from espnet_tpu.tasks.spk import ClassificationTask
        ClassificationTask.main(dict(cfg, output_dir=str(exp)))

    if args.stage <= 3 <= args.stop_stage:
        print("=== stage 3: eval top-1 accuracy ===", flush=True)
        import jax.numpy as jnp
        import numpy as np

        from espnet_tpu.data.batching import bucket_length
        from espnet_tpu.data.fileio import (read_2columns_text, read_wav)
        from espnet_tpu.tasks.spk import ClassificationTask

        ckpt = next(exp.glob("valid.acc.ave_*best"),
                    next(exp.glob("valid.*best"), exp))
        model, params, _ = ClassificationTask.build_model_from_file(
            exp / "config.yaml", ckpt)

        wavs = read_2columns_text(data / "test" / "wav.scp")
        labels = read_2columns_text(data / "test" / "label")
        keys = sorted(wavs)
        audio = [read_wav(wavs[k])[1] for k in keys]
        L = bucket_length(max(len(a) for a in audio), base=4096, growth=1.3)
        B = len(keys)
        speech = np.zeros((B, L), np.float32)
        lens = np.zeros((B,), np.int32)
        for j, a in enumerate(audio):
            speech[j, :len(a)] = a
            lens[j] = len(a)

        @jax.jit
        def predict(p, s, sl):
            return model.apply(p, s, sl, deterministic=True,
                               method=model.predict)
        logits = np.asarray(predict(params, jnp.asarray(speech),
                                    jnp.asarray(lens)))
        pred = logits.argmax(-1)
        y = np.asarray([int(labels[k]) for k in keys])
        acc = float((pred == y).mean())
        print(f"cls top-1 accuracy: {acc*100:.2f}%  ({B} utts, "
              f"{N_KEYWORDS} keywords)", flush=True)
        (work / "RESULTS.json").write_text(json.dumps(
            {"cls_top1_acc": acc, "n_utts": B, "n_classes": N_KEYWORDS}))

    if args.stage <= 4 <= args.stop_stage:
        print("=== stage 4: export asset ===", flush=True)
        import shutil

        import numpy as np

        from espnet_tpu.train.checkpoint import load_checkpoint

        asset = Path(args.asset_dir)
        asset.mkdir(parents=True, exist_ok=True)
        ckpt = next(exp.glob("valid.acc.ave_*best"),
                    next(exp.glob("valid.*best"), exp))
        params, _, _ = load_checkpoint(ckpt)
        flat = {}

        def _flat(tree, prefix=""):
            for k, v in tree.items():
                kk = f"{prefix}/{k}" if prefix else k
                if isinstance(v, dict):
                    _flat(v, kk)
                else:
                    flat[kk] = np.asarray(v)
        _flat(params)
        np.savez_compressed(
            asset / "params_f16.npz",
            **{k: (v.astype(np.float16) if v.dtype == np.float32 else v)
               for k, v in flat.items()})
        shutil.copy(exp / "config.yaml", asset / "config.yaml")
        (asset / "keywords.txt").write_text("\n".join(corpus.words) + "\n")
        if (work / "RESULTS.json").exists():
            shutil.copy(work / "RESULTS.json", asset / "RESULTS.json")


if __name__ == "__main__":
    main()
