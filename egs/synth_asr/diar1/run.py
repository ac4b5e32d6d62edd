#!/usr/bin/env python3
"""EEND diarization recipe on synthetic 2-speaker dialogs.

The egs2/TEMPLATE/diar1 stand-in (reference scoring:
egs2/TEMPLATE/diar1/diar.sh -> md-eval DER): build 8-second dialogs by
placing utterances from two distinct synthetic speakers on a timeline
(silences + genuine overlap), train the EEND model (models/diar.py —
per-frame per-speaker sigmoid activity, PIT-BCE), and score frame-level
DER (miss + false alarm + confusion over reference speech frames) with
the best speaker permutation per recording.

Stages: 1 data (dialogs + frame labels), 2 train (DiarizationTask),
3 eval DER, 4 export asset.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
ROOT = HERE.parents[2]
sys.path.insert(0, str(ROOT))

FS = 16000
WIN_S = 8.0
WIN = int(WIN_S * FS)
# label frame = frontend hop (128) x conv2d subsampling (4)
LABEL_HOP = 512
N_FRAMES = WIN // LABEL_HOP  # 250


def build_dialog(corpus, split, index, rng):
    """Two speakers, 1-2 utterances each, random placement in the
    window (overlap allowed) -> (mix, labels (N_FRAMES, 2))."""
    import numpy as np
    sids = rng.choice(len(corpus.speakers), size=2, replace=False)
    mix = np.zeros((WIN,), np.float32)
    labels = np.zeros((N_FRAMES, 2), np.int32)
    for s, sid in enumerate(sids):
        n_utt = rng.randint(1, 3)
        for u in range(n_utt):
            wave, _, _ = corpus.utterance(
                f"{split}-dia{index}-s{s}u{u}", rng.randint(1 << 30),
                speaker_ids=[int(sid)])
            if len(wave) > WIN:
                wave = wave[:WIN]
            start = rng.randint(0, WIN - len(wave) + 1)
            gain = 10 ** (rng.uniform(-3, 3) / 20)
            mix[start:start + len(wave)] += gain * wave
            f0, f1 = start // LABEL_HOP, (start + len(wave)) // LABEL_HOP
            labels[f0:min(f1 + 1, N_FRAMES), s] = 1
    mix += 0.002 * rng.randn(WIN).astype(np.float32)
    peak = np.abs(mix).max()
    if peak > 0.99:
        mix *= 0.99 / peak
    return mix, labels


def frame_der(ref, hyp):
    """Frame DER over (T, S) 0/1 arrays, best permutation
    (md-eval semantics without collar, overlap scored)."""
    import itertools

    import numpy as np
    S = ref.shape[1]
    best = None
    for p in itertools.permutations(range(S)):
        h = hyp[:, list(p)]
        n_ref = ref.sum(-1)
        n_hyp = h.sum(-1)
        n_cor = np.minimum(ref, h).sum(-1)
        miss = np.maximum(n_ref - n_hyp, 0)
        fa = np.maximum(n_hyp - n_ref, 0)
        conf = np.minimum(n_ref, n_hyp) - n_cor
        err = (miss + fa + conf).sum() / max(n_ref.sum(), 1)
        if best is None or err < best:
            best = err
    return float(best)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=1)
    ap.add_argument("--stop_stage", type=int, default=4)
    ap.add_argument("--workdir", default=str(HERE / "work"))
    ap.add_argument("--n_train", type=int, default=1000)
    ap.add_argument("--n_valid", type=int, default=60)
    ap.add_argument("--n_test", type=int, default=50)
    ap.add_argument("--max_epoch", type=int, default=25)
    ap.add_argument("--device", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--asset_dir", default=str(ROOT / "assets" /
                                               "synth_diar"))
    args = ap.parse_args()
    work = Path(args.workdir)
    data = work / "data"
    exp = work / "exp" / "diar"

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(work / "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    cfg = {
        "num_spk": 2,
        "frontend_conf": {"n_fft": 512, "hop_length": 128, "n_mels": 40},
        "encoder": "transformer",
        "encoder_conf": {"output_size": 192, "attention_heads": 4,
                         "linear_units": 768, "num_blocks": 4,
                         "input_layer": "conv2d"},
        "optim": "adam", "optim_conf": {"lr": 1e-3},
        "scheduler": "warmuplr", "scheduler_conf": {"warmup_steps": 500},
        "grad_clip": 5.0,
        "batch_type": "unsorted", "batch_size": 16,
        "collate_fixed_lengths": {"speech": WIN,
                                  "spk_labels": N_FRAMES},
        "max_epoch": args.max_epoch,
        "keep_nbest_models": 2, "patience": None,
        "log_interval": 20, "steps_per_dispatch": 8, "resume": True,
        "train_data_path_and_name_and_type": [
            f"{data}/train/wav.scp,speech,sound",
            f"{data}/train/labels.scp,spk_labels,npy"],
        "valid_data_path_and_name_and_type": [
            f"{data}/valid/wav.scp,speech,sound",
            f"{data}/valid/labels.scp,spk_labels,npy"],
    }

    if args.stage <= 1 <= args.stop_stage:
        print("=== stage 1: dialog data ===", flush=True)
        import numpy as np

        from espnet_tpu.data.fileio import write_wav
        from espnet_tpu.data.synth_speech import SynthSpeechCorpus
        corpus = SynthSpeechCorpus()
        for split, n in (("train", args.n_train), ("valid", args.n_valid),
                         ("test", args.n_test)):
            d = data / split
            (d / "wav").mkdir(parents=True, exist_ok=True)
            (d / "lab").mkdir(parents=True, exist_ok=True)
            rng = np.random.RandomState(hash(split) % (1 << 31))
            with open(d / "wav.scp", "w") as fw, \
                    open(d / "labels.scp", "w") as fl:
                for i in range(n):
                    mix, labels = build_dialog(corpus, split, i, rng)
                    uid = f"{split}_{i:05d}"
                    write_wav(d / "wav" / f"{uid}.wav", FS, mix)
                    np.save(d / "lab" / f"{uid}.npy", labels)
                    fw.write(f"{uid} {d / 'wav' / f'{uid}.wav'}\n")
                    fl.write(f"{uid} {d / 'lab' / f'{uid}.npy'}\n")

    if args.stage <= 2 <= args.stop_stage:
        print("=== stage 2: train EEND ===", flush=True)
        from espnet_tpu.tasks.spk import DiarizationTask
        DiarizationTask.main(dict(cfg, output_dir=str(exp)))

    if args.stage <= 3 <= args.stop_stage:
        print("=== stage 3: eval DER ===", flush=True)
        import jax.numpy as jnp
        import numpy as np
        from espnet_tpu.data.fileio import read_wav

        from espnet_tpu.data.fileio import read_2columns_text
        from espnet_tpu.tasks.spk import DiarizationTask

        ckpt = next(exp.glob("valid.loss.ave_*best"),
                    exp / "valid.loss.best")
        model, params, _ = DiarizationTask.build_model_from_file(
            exp / "config.yaml", ckpt)

        predict = jax.jit(lambda p, s, sl: model.apply(
            p, s, sl, deterministic=True, method=model.predict))
        wavs = read_2columns_text(data / "test" / "wav.scp")
        labs = read_2columns_text(data / "test" / "labels.scp")
        keys = sorted(wavs)[:args.n_test]
        ders = []
        B = 8
        for i in range(0, len(keys), B):
            chunk = keys[i:i + B]
            w = np.zeros((B, WIN), np.float32)
            for j, k in enumerate(chunk):
                _, a = read_wav(wavs[k])
                w[j, :min(len(a), WIN)] = a[:WIN]
            logits, olens = predict(params, jnp.asarray(w),
                                    jnp.full((B,), WIN, np.int32))
            act = np.asarray(jax.nn.sigmoid(logits) > 0.5, np.int32)
            for j, k in enumerate(chunk):
                ref = np.load(labs[k])
                T = min(ref.shape[0], act.shape[1])
                ders.append(frame_der(ref[:T], act[j, :T]))
        der = float(np.mean(ders))
        print(f"DER: {der * 100:.2f}%  ({len(keys)} dialogs)", flush=True)
        (work / "RESULTS.json").write_text(json.dumps(
            {"der": der, "n_dialogs": len(keys)}))

    if args.stage <= 4 <= args.stop_stage:
        print("=== stage 4: export asset ===", flush=True)
        import shutil

        import numpy as np

        from espnet_tpu.train.checkpoint import load_checkpoint

        asset = Path(args.asset_dir)
        asset.mkdir(parents=True, exist_ok=True)
        ckpt = next(exp.glob("valid.loss.ave_*best"),
                    exp / "valid.loss.best")
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
        if (work / "RESULTS.json").exists():
            shutil.copy(work / "RESULTS.json", asset / "RESULTS.json")


if __name__ == "__main__":
    main()
