#!/usr/bin/env python3
"""Neural-codec recipe on the synthetic corpus.

The egs2/TEMPLATE/codec1 stand-in: train the SoundStream-class residual
-VQ codec (models/codec.py) on synthetic speech and score held-out
reconstruction — SI-SNR, log-mel L1 distortion, and effective bitrate —
the in-env analogue of the reference's ViSQOL/pesq codec scoring
(egs2/TEMPLATE/codec1/scripts: codec_score.py semantics).

Stages: 1 data, 2 train (CodecTask), 3 eval reconstruction,
4 export asset.
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
    ap.add_argument("--n_train", type=int, default=1500)
    ap.add_argument("--n_valid", type=int, default=60)
    ap.add_argument("--n_test", type=int, default=50)
    ap.add_argument("--max_epoch", type=int, default=15)
    ap.add_argument("--codec_type", default="soundstream",
                    choices=["soundstream", "encodec", "dac"])
    ap.add_argument("--device", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--asset_dir", default=str(ROOT / "assets" /
                                               "synth_codec"))
    args = ap.parse_args()
    work = Path(args.workdir)
    data = work / "data"
    exp = work / "exp" / f"codec_{args.codec_type}"

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
        "fs": 16000,
        "codec_type": args.codec_type,
        "codec_conf": {"codec_type": args.codec_type, "channels": 32,
                       "strides": (2, 4, 5, 8), "code_dim": 128,
                       "num_quantizers": 4, "codebook_size": 256},
        "optim": "adam", "optim_conf": {"lr": 3e-4},
        "batch_type": "sorted", "batch_size": 8,
        "collate_fixed_lengths": {"speech": UTT_SAMPLES},
        "max_epoch": args.max_epoch,
        "keep_nbest_models": 2, "patience": None,
        "log_interval": 50, "steps_per_dispatch": 8, "resume": True,
        "train_data_path_and_name_and_type": [
            f"{data}/train/wav.scp,speech,sound"],
        "valid_data_path_and_name_and_type": [
            f"{data}/valid/wav.scp,speech,sound"],
    }

    if args.stage <= 1 <= args.stop_stage:
        print("=== stage 1: data ===", flush=True)
        from espnet_tpu.data.synth_speech import SynthSpeechCorpus
        SynthSpeechCorpus().materialize(data, n_train=args.n_train,
                                        n_valid=args.n_valid,
                                        n_test=args.n_test)

    if args.stage <= 2 <= args.stop_stage:
        print("=== stage 2: train codec ===", flush=True)
        from espnet_tpu.tasks.ssl import CodecTask
        CodecTask.main(dict(cfg, output_dir=str(exp)))

    if args.stage <= 3 <= args.stop_stage:
        print("=== stage 3: eval reconstruction ===", flush=True)
        import jax.numpy as jnp
        import numpy as np
        from espnet_tpu.data.fileio import read_wav

        from espnet_tpu.data.fileio import read_2columns_text
        from espnet_tpu.ops.mel import log_mel
        from espnet_tpu.ops.stft import stft_power
        from espnet_tpu.tasks.ssl import CodecTask

        ckpt = next(exp.glob("valid.loss.ave_*best"),
                    exp / "valid.loss.best")
        model, params, tcfg = CodecTask.build_model_from_file(
            exp / "config.yaml", ckpt)
        wavs = read_2columns_text(data / "test" / "wav.scp")
        keys = sorted(wavs)[:args.n_test]

        @jax.jit
        def roundtrip(p, w):
            codes = model.apply(p, w, method=model.encode)
            return model.apply(p, codes, method=model.decode), codes

        B = 8
        si_snrs, mel_l1s = [], []
        for i in range(0, len(keys), B):
            chunk = keys[i:i + B]
            w = np.zeros((B, UTT_SAMPLES), np.float32)
            for j, k in enumerate(chunk):
                _, a = read_wav(wavs[k])
                w[j, :min(len(a), UTT_SAMPLES)] = a[:UTT_SAMPLES]
            recon, codes = roundtrip(params, jnp.asarray(w))
            recon = np.asarray(recon)[:len(chunk)]
            ref = w[:len(chunk), :recon.shape[1]]
            est = recon[:, :ref.shape[1]]
            ref0 = ref - ref.mean(-1, keepdims=True)
            est0 = est - est.mean(-1, keepdims=True)
            s = (np.sum(est0 * ref0, -1, keepdims=True)
                 / (np.sum(ref0 ** 2, -1, keepdims=True) + 1e-8)) * ref0
            si = 10 * np.log10(np.sum(s ** 2, -1)
                               / (np.sum((est0 - s) ** 2, -1) + 1e-8))
            si_snrs.extend(si.tolist())
            p1, _ = stft_power(jnp.asarray(est), None, n_fft=512,
                               hop_length=128)
            p2, _ = stft_power(jnp.asarray(ref), None, n_fft=512,
                               hop_length=128)
            m1 = log_mel(p1, fs=16000, n_fft=512, n_mels=80)
            m2 = log_mel(p2, fs=16000, n_fft=512, n_mels=80)
            mel_l1s.append(float(jnp.mean(jnp.abs(m1 - m2))))
        hop = 1
        for s in cfg["codec_conf"]["strides"]:
            hop *= s
        import math
        bitrate = (16000 / hop) * cfg["codec_conf"]["num_quantizers"] \
            * math.log2(cfg["codec_conf"]["codebook_size"])
        res = {"si_snr_db": float(np.mean(si_snrs)),
               "mel_l1": float(np.mean(mel_l1s)),
               "bitrate_kbps": round(bitrate / 1000, 2),
               "n_utts": len(keys)}
        print(f"codec recon SI-SNR {res['si_snr_db']:.2f} dB, mel-L1 "
              f"{res['mel_l1']:.3f} @ {res['bitrate_kbps']} kbps",
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
        if (work / "RESULTS.json").exists():
            shutil.copy(work / "RESULTS.json", asset / "RESULTS.json")


if __name__ == "__main__":
    main()
