#!/usr/bin/env python3
"""HuBERT SSL pretraining recipe on the synthetic corpus.

The egs2/TEMPLATE/hubert1 stand-in (reference pipeline:
egs2/TEMPLATE/hubert1/hubert.sh — MFCC k-means -> iter0 masked
prediction -> re-cluster on layer features -> iter1): runs the in-repo
iterative loop (bin/hubert_pretrain_loop.py) at reduced scale and
reports the quantities the reference tracks: per-iteration k-means
inertia and held-out masked-prediction accuracy.

Stages: 1 data, 2 hubert loop (2 iterations), 3 eval (valid masked
accuracy of the final iteration), 4 export asset.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
ROOT = HERE.parents[2]
sys.path.insert(0, str(ROOT))

UTT_SAMPLES = 74656


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=1)
    ap.add_argument("--stop_stage", type=int, default=4)
    ap.add_argument("--workdir", default=str(HERE / "work"))
    ap.add_argument("--n_train", type=int, default=600)
    ap.add_argument("--n_valid", type=int, default=60)
    ap.add_argument("--n_clusters", type=int, default=32)
    ap.add_argument("--n_iterations", type=int, default=2)
    ap.add_argument("--max_epoch", type=int, default=12)
    ap.add_argument("--device", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--asset_dir", default=str(ROOT / "assets" /
                                               "synth_hubert"))
    args = ap.parse_args()
    work = Path(args.workdir)
    data = work / "data"
    exp_root = work / "exp" / "hubert"

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(work / "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    # hop 320 -> 50 Hz label frames, matching the loop's MFCC rate
    train_conf = {
        "num_classes": args.n_clusters,
        "frontend_conf": {"n_fft": 512, "hop_length": 320, "n_mels": 80},
        "encoder": "transformer",
        "encoder_conf": {"output_size": 192, "attention_heads": 4,
                         "linear_units": 768, "num_blocks": 4,
                         "input_layer": "linear"},
        "model_conf": {"mask_prob": 0.10, "mask_length": 8,
                       "masked_weight": 1.0, "unmasked_weight": 0.0},
        "optim": "adam", "optim_conf": {"lr": 1e-3},
        "scheduler": "warmuplr", "scheduler_conf": {"warmup_steps": 400},
        "grad_clip": 5.0,
        "batch_type": "sorted", "batch_size": 16,
        "collate_fixed_lengths": {"speech": UTT_SAMPLES,
                                  "text": UTT_SAMPLES // 320 + 1},
        "max_epoch": args.max_epoch,
        "keep_nbest_models": 2, "patience": None,
        "log_interval": 20, "steps_per_dispatch": 8, "resume": True,
    }

    if args.stage <= 1 <= args.stop_stage:
        print("=== stage 1: data ===", flush=True)
        from espnet_tpu.data.synth_speech import SynthSpeechCorpus
        SynthSpeechCorpus().materialize(data, n_train=args.n_train,
                                        n_valid=args.n_valid, n_test=0)

    if args.stage <= 2 <= args.stop_stage:
        print("=== stage 2: iterative hubert loop ===", flush=True)
        from espnet_tpu.bin.hubert_pretrain_loop import hubert_pretrain_loop
        hubert_pretrain_loop(
            output_dir=str(exp_root),
            train_wav_scp=str(data / "train" / "wav.scp"),
            valid_wav_scp=str(data / "valid" / "wav.scp"),
            n_iterations=args.n_iterations,
            n_clusters=args.n_clusters,
            feature_layer=2,
            train_conf=train_conf)

    last = exp_root / f"iter{args.n_iterations - 1}"

    if args.stage <= 3 <= args.stop_stage:
        print("=== stage 3: eval masked accuracy ===", flush=True)
        import jax.numpy as jnp
        import numpy as np
        from espnet_tpu.data.fileio import read_wav

        from espnet_tpu.data.fileio import read_2columns_text
        from espnet_tpu.tasks.ssl import HubertTask

        ckpt = next(last.glob("valid.loss.ave_*best"),
                    last / "valid.loss.best")
        model, params, tcfg = HubertTask.build_model_from_file(
            last / "config.yaml", ckpt)
        it = args.n_iterations - 1
        labels = {}
        lab_file = exp_root / f"labels_valid_iter{it}"
        for line in Path(lab_file).read_text().splitlines():
            k, v = line.split(" ", 1)
            labels[k] = np.asarray([int(t) for t in v.split()], np.int32)
        wavs = read_2columns_text(data / "valid" / "wav.scp")
        keys = sorted(wavs)
        T_lab = UTT_SAMPLES // 320 + 1

        @jax.jit
        def eval_step(p, s, sl, t, tl, r):
            return model.apply(p, s, sl, t, tl, deterministic=False,
                               rngs={"mask": r})[1]["acc_masked"]

        accs = []
        B = 8
        for i in range(0, len(keys), B):
            chunk = keys[i:i + B]
            w = np.zeros((B, UTT_SAMPLES), np.float32)
            t = np.zeros((B, T_lab), np.int32)
            tl = np.zeros((B,), np.int32)
            for j, k in enumerate(chunk):
                _, a = read_wav(wavs[k])
                w[j, :min(len(a), UTT_SAMPLES)] = a[:UTT_SAMPLES]
                lab = labels[k][:T_lab]
                t[j, :len(lab)] = lab
                tl[j] = len(lab)
            accs.append(float(eval_step(
                params, jnp.asarray(w), jnp.full((B,), UTT_SAMPLES,
                                                 np.int32),
                jnp.asarray(t), jnp.asarray(tl), jax.random.PRNGKey(i))))
        inertias = {}
        for i in range(args.n_iterations):
            c = exp_root / f"km_centers_iter{i}.npy"
            if c.exists():
                inertias[f"iter{i}_centers"] = str(c.name)
        res = {"masked_acc": float(np.mean(accs)),
               "n_clusters": args.n_clusters,
               "n_iterations": args.n_iterations}
        print(f"hubert iter{it} valid masked acc: "
              f"{res['masked_acc']*100:.2f}% ({args.n_clusters} units)",
              flush=True)
        (work / "RESULTS.json").write_text(json.dumps(res))

    if args.stage <= 4 <= args.stop_stage:
        print("=== stage 4: export asset ===", flush=True)
        import shutil

        import numpy as np

        from espnet_tpu.train.checkpoint import load_checkpoint

        asset = Path(args.asset_dir)
        asset.mkdir(parents=True, exist_ok=True)
        ckpt = next(last.glob("valid.loss.ave_*best"),
                    last / "valid.loss.best")
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
        shutil.copy(last / "config.yaml", asset / "config.yaml")
        it = args.n_iterations - 1
        km = exp_root / f"km_centers_iter{it}.npy"
        if km.exists():
            shutil.copy(km, asset / "km_centers.npy")
        if (work / "RESULTS.json").exists():
            shutil.copy(work / "RESULTS.json", asset / "RESULTS.json")


if __name__ == "__main__":
    main()
