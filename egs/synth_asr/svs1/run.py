#!/usr/bin/env python3
"""Singing-voice-synthesis recipe on the synthetic singing corpus.

The egs2/TEMPLATE/svs1 stand-in: train XiaoiceSing (models/svs.py,
score-conditioned FastSpeech-style mel model) on deterministic
note-sequence singing (SynthSingingCorpus) and score the held-out
synthesis the way SVS papers do: frame-wise F0 RMSE / voiced correlation
vs the score's note pitch (the model must realize the commanded
melody), plus mel-spectral L1 vs the reference rendition.

Stages: 1 data, 2 train (SVSTask), 3 eval (SingingGenerate + F0
metrics), 4 export asset.
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
HOP = 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=1)
    ap.add_argument("--stop_stage", type=int, default=4)
    ap.add_argument("--workdir", default=str(HERE / "work"))
    ap.add_argument("--n_train", type=int, default=400)
    ap.add_argument("--n_valid", type=int, default=40)
    ap.add_argument("--n_eval", type=int, default=24)
    ap.add_argument("--max_epoch", type=int, default=40)
    ap.add_argument("--device", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--asset_dir", default=str(ROOT / "assets" /
                                               "synth_svs"))
    args = ap.parse_args()
    work = Path(args.workdir)
    data = work / "data"
    exp = work / "exp" / "xiaoice"

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(work / "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    toks = ["<blank>", "<unk>", "a", "e", "i", "o", "u", "<rest>",
            "<sos/eos>"]
    cfg = {
        "token_list": str(data / "tokens.txt"),
        "feats_extract_conf": {"fs": FS, "n_fft": 512, "hop_length": HOP,
                               "n_mels": 80},
        "svs": "xiaoice",
        "svs_conf": {"adim": 192, "aheads": 4, "elayers": 4, "dlayers": 4,
                     "eunits": 768, "dunits": 768, "postnet_layers": 3,
                     "postnet_chans": 128},
        "optim": "adam", "optim_conf": {"lr": 1e-3},
        "scheduler": "warmuplr", "scheduler_conf": {"warmup_steps": 500},
        "grad_clip": 5.0,
        "batch_type": "sorted", "batch_size": 8,
        "max_epoch": args.max_epoch,
        "keep_nbest_models": 2, "patience": None,
        "log_interval": 20, "steps_per_dispatch": 4, "resume": True,
        "train_data_path_and_name_and_type": [
            f"{data}/train/wav.scp,speech,sound",
            f"{data}/train/score.scp,score,score"],
        "valid_data_path_and_name_and_type": [
            f"{data}/valid/wav.scp,speech,sound",
            f"{data}/valid/score.scp,score,score"],
    }

    if args.stage <= 1 <= args.stop_stage:
        print("=== stage 1: singing data ===", flush=True)
        from espnet_tpu.data.synth_speech import SynthSingingCorpus
        SynthSingingCorpus().materialize(data, n_train=args.n_train,
                                         n_valid=args.n_valid)
        (data / "tokens.txt").write_text("\n".join(toks) + "\n")

    if args.stage <= 2 <= args.stop_stage:
        print("=== stage 2: train XiaoiceSing ===", flush=True)
        from espnet_tpu.tasks.svs import SVSTask
        SVSTask.main(dict(cfg, output_dir=str(exp)))

    if args.stage <= 3 <= args.stop_stage:
        print("=== stage 3: eval F0 / mel metrics ===", flush=True)
        import jax.numpy as jnp
        import numpy as np
        from espnet_tpu.data.fileio import read_wav

        from espnet_tpu.bin.svs_inference import SingingGenerate
        from espnet_tpu.data.fileio import read_2columns_text
        from espnet_tpu.data.score_io import SingingScoreReader
        from espnet_tpu.data.synth_speech import midi_to_hz
        from espnet_tpu.models.tts.feats import extract_f0
        from espnet_tpu.ops.mel import log_mel
        from espnet_tpu.ops.stft import stft_power

        ckpt = next(exp.glob("valid.loss.ave_*best"),
                    exp / "valid.loss.best")
        gen = SingingGenerate(train_config=exp / "config.yaml",
                              model_file=ckpt, griffin_lim_iters=32)
        scores = SingingScoreReader(data / "valid" / "score.scp")
        wavs = read_2columns_text(data / "valid" / "wav.scp")
        keys = sorted(scores.keys())[:args.n_eval]
        f0_rmse, f0_corr, mel_l1 = [], [], []
        wavdir = work / "synth_wavs"
        wavdir.mkdir(parents=True, exist_ok=True)
        from espnet_tpu.data.fileio import write_wav
        for k in keys:
            score = scores[k]
            out = gen(score)
            wav = np.asarray(out["wav"], np.float32)
            write_wav(wavdir / f"{k}.wav", FS, wav)
            # score -> frame f0 target
            T = len(wav) // HOP
            tgt = np.zeros((T,), np.float32)
            for st, et, _, midi, _ in score["note"]:
                f0v = midi_to_hz(midi) if midi > 0 else 0.0
                a, b = int(st * FS / HOP), min(int(et * FS / HOP), T)
                tgt[a:b] = f0v
            est = np.asarray(extract_f0(
                jnp.asarray(wav)[None], jnp.asarray([len(wav)], np.int32),
                fs=FS, hop_length=HOP))[0][:T]
            v = (tgt > 0) & (est > 0)
            if v.sum() > 8:
                f0_rmse.append(float(np.sqrt(np.mean(
                    (est[v] - tgt[v]) ** 2))))
                f0_corr.append(float(np.corrcoef(est[v], tgt[v])[0, 1]))
            _, ref = read_wav(wavs[k])
            n = min(len(ref), len(wav))
            if n > 2048:
                p1, _ = stft_power(jnp.asarray(wav[:n])[None], None,
                                   n_fft=512, hop_length=HOP)
                p2, _ = stft_power(jnp.asarray(ref[:n])[None], None,
                                   n_fft=512, hop_length=HOP)
                m1 = log_mel(p1, fs=FS, n_fft=512, n_mels=80)
                m2 = log_mel(p2, fs=FS, n_fft=512, n_mels=80)
                mel_l1.append(float(jnp.mean(jnp.abs(m1 - m2))))
        res = {"f0_rmse_hz": float(np.mean(f0_rmse)),
               "f0_corr": float(np.mean(f0_corr)),
               "mel_l1": float(np.mean(mel_l1)),
               "n_utts": len(keys)}
        print(f"SVS F0 RMSE {res['f0_rmse_hz']:.1f} Hz, corr "
              f"{res['f0_corr']:.3f}, mel-L1 {res['mel_l1']:.3f}",
              flush=True)
        (work / "RESULTS.json").write_text(json.dumps(res))

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
        shutil.copy(data / "tokens.txt", asset / "tokens.txt")
        if (work / "RESULTS.json").exists():
            shutil.copy(work / "RESULTS.json", asset / "RESULTS.json")


if __name__ == "__main__":
    main()
