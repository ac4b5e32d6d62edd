#!/usr/bin/env python3
"""End-to-end JETS TTS -> ASR intelligibility loop (single speaker).

JETS (reference: espnet2/gan_tts/jets/jets.py) trains FS2 + HiFiGAN
jointly with MAS alignment learning: the vocoder is trained on
PREDICTED hidden features, which removes the two-stage mel-oversmoothing
mismatch that capped the FS2+HiFiGAN loop at ~55% WER, and unlike VITS
there is no stochastic prior to mismatch at decode time.

Stages: 1 data (speaker-0 corpus), 2 train (GANTTSTask tts=jets),
3 synthesize + ASR round trip, 4 export asset.
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
    ap.add_argument("--stop_stage", type=int, default=4)
    ap.add_argument("--asset_dir", default=str(ROOT / "assets" /
                                               "synth_tts_jets"))
    ap.add_argument("--workdir", default=str(HERE / "work_jets"))
    ap.add_argument("--n_train", type=int, default=2000)
    ap.add_argument("--n_valid", type=int, default=60)
    ap.add_argument("--n_eval", type=int, default=50)
    ap.add_argument("--max_epoch", type=int, default=80)
    ap.add_argument("--device", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--asr_asset", default=str(ROOT / "assets" /
                                               "synth_asr_flagship"))
    args = ap.parse_args()
    work = Path(args.workdir)
    data = work / "data"
    exp = work / "exp" / "jets"

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
    corpus = SynthSpeechCorpus()
    token_list = (["<blank>"] + corpus.char_vocab + ["<space>",
                                                     "<sos/eos>"])

    # speech fixed at 74656 samples -> 583 mel frames at hop 128
    cfg = {
        "token_list": str(data / "tokens.txt"),
        "token_type": "char",
        "fs": 16000, "n_fft": 512, "hop_length": 128, "n_mels": 80,
        "tts": "jets",
        "tts_conf": {"adim": 192, "aheads": 2, "elayers": 3, "dlayers": 3,
                     "units": 768, "segment_frames": 32,
                     "generator_conf": {"channels": 256,
                                        "upsample_scales": (8, 4, 4),
                                        "upsample_kernel_sizes": (16, 8, 8),
                                        "kernel_size": 7,
                                        "resblock_kernel_sizes": (3, 7),
                                        "resblock_dilations": ((1, 3),
                                                               (1, 3))}},
        "discriminator_conf": {"periods": (2, 3, 5), "scales": 2},
        "grad_clip": -1,
        "optim": "adam",
        "optim_conf": {"lr": 2e-4, "betas": (0.8, 0.99)},
        "optim2_conf": {"lr": 2e-4, "betas": (0.8, 0.99)},
        "batch_type": "sorted",
        "batch_size": 16,
        "collate_fixed_lengths": {"text": 64, "speech": 74656},
        "max_epoch": args.max_epoch,
        "keep_nbest_models": 2,
        "patience": None,
        "log_interval": 20,
        "steps_per_dispatch": 8,
        "resume": True,
        "train_data_path_and_name_and_type": [
            f"{data}/train/text,text,text",
            f"{data}/train/wav.scp,speech,sound"],
        "valid_data_path_and_name_and_type": [
            f"{data}/valid/text,text,text",
            f"{data}/valid/wav.scp,speech,sound"],
    }

    if args.stage <= 1 <= args.stop_stage:
        print("=== stage 1: data (speaker-0 corpus) ===", flush=True)
        corpus.materialize(data, n_train=args.n_train,
                           n_valid=args.n_valid, n_test=0,
                           speaker_ids=[0])
        (data / "tokens.txt").write_text("\n".join(token_list) + "\n",
                                         encoding="utf-8")

    if args.stage <= 2 <= args.stop_stage:
        print("=== stage 2: train JETS (GANTrainer) ===", flush=True)
        from espnet_tpu.tasks.gan_tts import GANTTSTask
        GANTTSTask.main(dict(cfg, output_dir=str(exp)))

    if args.stage <= 3 <= args.stop_stage:
        print("=== stage 3: JETS synth + ASR round trip ===", flush=True)
        import jax.numpy as jnp
        import numpy as np

        from espnet_tpu.bin.asr_inference import Speech2Text
        from espnet_tpu.data.batching import bucket_length
        from espnet_tpu.data.fileio import read_2columns_text, write_wav
        from espnet_tpu.tasks.gan_tts import GANTTSTask
        from espnet_tpu.utils.native import score_corpus

        ckpt = next(exp.glob("valid.loss.ave_*best"),
                    exp / "valid.loss.best")
        model, params, tcfg = GANTTSTask.build_model_from_file(
            exp / "config.yaml", ckpt)
        pre = GANTTSTask.build_preprocess_fn(tcfg, train=False)
        hop = int(tcfg["hop_length"])
        MAXF = 640          # 5.1 s ceiling at hop 128 / 16 kHz
        TPAD = 64

        dec = jax.jit(lambda p, t, tl: model.decode(
            p, t, tl, max_frames=MAXF))

        asset = Path(args.asr_asset)
        s2t = Speech2Text(asr_train_config=asset / "config.yaml",
                          asr_model_file=asset, beam_size=10,
                          ctc_weight=0.3)
        texts = read_2columns_text(data / "valid" / "text")
        keys = sorted(texts)[:args.n_eval]
        wavdir = work / "synth_wavs"
        wavdir.mkdir(parents=True, exist_ok=True)
        refs, hyps = [], []
        for k in keys:
            ids = np.asarray(pre("<synth>", {"text": texts[k],
                                             "speech": np.zeros(
                                                 (512,), np.float32)})
                             ["text"], np.int32)
            t = np.zeros((1, TPAD), np.int32)
            t[0, :len(ids)] = ids
            wav, olens = dec(params, jnp.asarray(t),
                             jnp.asarray([len(ids)], np.int32))
            n = int(np.asarray(olens)[0]) * hop
            wav = np.asarray(wav, np.float32)[0, :n]
            write_wav(wavdir / f"{k}.wav", 16000, wav)
            Lb = bucket_length(max(len(wav), 4096), base=4096, growth=1.3)
            nb = s2t(np.pad(wav, (0, Lb - len(wav)))[None],
                     np.asarray([len(wav)], np.int32))
            hyps.append(nb[0][0][0])
            refs.append(texts[k])
        wer = score_corpus(refs, hyps, unit="word")
        cer = score_corpus(refs, hyps, unit="char")
        print(f"JETS->ASR WER: {wer['err_rate'] * 100:.2f}%  "
              f"CER: {cer['err_rate'] * 100:.2f}%  ({len(keys)} utts)",
              flush=True)
        (work / "RESULTS.json").write_text(json.dumps(
            {"jets_asr_wer": wer["err_rate"],
             "jets_asr_cer": cer["err_rate"], "n_utts": len(keys)}))

    if args.stage <= 4 <= args.stop_stage:
        print("=== stage 4: export asset ===", flush=True)
        import shutil

        import numpy as np

        from espnet_tpu.train.checkpoint import load_checkpoint

        def _flatten(tree, prefix=()):
            out = {}
            for k, v in tree.items():
                if isinstance(v, dict):
                    out.update(_flatten(v, prefix + (k,)))
                else:
                    out[prefix + (k,)] = v
            return out

        asset = Path(args.asset_dir)
        asset.mkdir(parents=True, exist_ok=True)
        ckpt = next(exp.glob("valid.loss.ave_*best"),
                    exp / "valid.loss.best")
        params, _, _ = load_checkpoint(ckpt)
        flat = {"/".join(map(str, k)): np.asarray(v)
                for k, v in _flatten(params).items()}
        comp = {k: (v.astype(np.float16) if v.dtype == np.float32 else v)
                for k, v in flat.items()}
        np.savez_compressed(asset / "params_f16.npz", **comp)
        shutil.copy(exp / "config.yaml", asset / "config.yaml")
        shutil.copy(data / "tokens.txt", asset / "tokens.txt")
        if (work / "RESULTS.json").exists():
            shutil.copy(work / "RESULTS.json", asset / "RESULTS.json")


if __name__ == "__main__":
    main()
