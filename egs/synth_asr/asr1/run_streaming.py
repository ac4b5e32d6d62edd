#!/usr/bin/env python3
"""Streaming ASR recipe on the synthetic corpus.

BASELINE configs[3] evidence (streaming transducer/CTC): train the
chunked-causal StreamingConformerEncoder with CTC on the same
formant-synthesis corpus as the flagship, then decode with the TRUE
streaming path (Speech2TextStreaming: chunked audio pushes through
StreamingFeatureExtractor + stream_step + incremental greedy CTC) and
report WER plus per-chunk decode latency (the calculate_rtf contract).

Stages: 1 data (reuses the flagship's if present), 2 stats, 3 train,
4 streaming decode + score + latency.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent
ROOT = HERE.parents[2]
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=1)
    ap.add_argument("--stop_stage", type=int, default=4)
    ap.add_argument("--workdir", default=str(HERE / "work_streaming"))
    ap.add_argument("--datadir", default=str(HERE / "work" / "data"))
    ap.add_argument("--n_train", type=int, default=2000)
    ap.add_argument("--n_valid", type=int, default=100)
    ap.add_argument("--max_epoch", type=int, default=40)
    ap.add_argument("--chunk_ms", type=float, default=640.0,
                    help="audio pushed per streaming call")
    ap.add_argument("--asset_dir", default=str(ROOT / "assets" /
                                               "synth_asr_streaming"))
    args = ap.parse_args()
    work = Path(args.workdir)

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(work / "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from espnet_tpu.data.synth_speech import SynthSpeechCorpus
    corpus = SynthSpeechCorpus()
    token_list = (["<blank>"] + corpus.char_vocab + ["<space>", "<sos/eos>"])

    data = Path(args.datadir)
    stats = work / "stats"
    exp = work / "exp" / "asr_streaming"

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
        "encoder": "streaming_conformer",
        "encoder_conf": {"output_size": 256, "attention_heads": 4,
                         "linear_units": 1024, "num_blocks": 6,
                         "chunk_size": 20, "left_chunks": 4,
                         "cnn_kernel": 15},
        "decoder": None,
        "model_conf": {"ctc_weight": 1.0},
        "optim": "adam",
        "optim_conf": {"lr": 0.002},
        "scheduler": "warmuplr",
        "scheduler_conf": {"warmup_steps": 600},
        "grad_clip": 5.0,
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
        print("=== stage 1: data ===", flush=True)
        if not (data / "tokens.txt").exists():
            corpus.materialize(data, n_train=args.n_train,
                               n_valid=args.n_valid, n_test=0)
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
        print("=== stage 4: TRUE streaming decode + latency ===", flush=True)
        import numpy as np

        from espnet_tpu.bin.asr_inference_streaming import \
            Speech2TextStreaming
        from espnet_tpu.data.fileio import (SoundScpReader,
                                            read_2columns_text)
        from espnet_tpu.utils.native import score_corpus
        model = next(exp.glob("valid.loss.ave_*best"),
                     exp / "valid.loss.best")
        s2t = Speech2TextStreaming(
            asr_train_config=exp / "config.yaml", asr_model_file=model)
        reader = SoundScpReader(data / "valid" / "wav.scp")
        texts = read_2columns_text(data / "valid" / "text")
        chunk = int(16000 * args.chunk_ms / 1000.0)
        refs, hyps, lats = [], [], []
        for k in sorted(reader.keys()):
            _, audio = reader[k]
            audio = np.asarray(audio, np.float32)
            res = None
            for i in range(0, len(audio), chunk):
                t0 = time.perf_counter()
                res = s2t(audio[i:i + chunk],
                          is_final=i + chunk >= len(audio))
                lats.append(time.perf_counter() - t0)
            hyps.append(res[0][0] if res else "")
            refs.append(texts[k])
        wer = score_corpus(refs, hyps, unit="word")
        cer = score_corpus(refs, hyps, unit="char")
        lats_np = np.asarray(lats[4:])  # drop warmup/compile chunks
        out = {"wer": wer["err_rate"], "cer": cer["err_rate"],
               "n_utts": len(refs), "chunk_ms": args.chunk_ms,
               "chunk_latency_ms_p50": float(
                   np.percentile(lats_np, 50) * 1000),
               "chunk_latency_ms_p95": float(
                   np.percentile(lats_np, 95) * 1000)}
        print(f"streaming WER: {wer['err_rate'] * 100:.2f}%  "
              f"CER: {cer['err_rate'] * 100:.2f}%  "
              f"p50 chunk latency {out['chunk_latency_ms_p50']:.1f} ms "
              f"(chunk {args.chunk_ms:.0f} ms)")
        (work / "RESULTS.json").write_text(json.dumps(out))
        asset = Path(args.asset_dir)
        asset.mkdir(parents=True, exist_ok=True)
        import shutil

        from espnet_tpu.train.checkpoint import load_checkpoint
        params, _, _ = load_checkpoint(model)
        flat = {}

        def _flatten(tree, prefix=()):
            if isinstance(tree, dict):
                for kk, v in tree.items():
                    _flatten(v, prefix + (kk,))
            else:
                flat["/".join(prefix)] = np.asarray(tree)
        _flatten(params)
        comp = {k: (v.astype(np.float16) if v.dtype == np.float32 else v)
                for k, v in flat.items()}
        np.savez_compressed(asset / "params_f16.npz", **comp)
        shutil.copy(exp / "config.yaml", asset / "config.yaml")
        shutil.copy(data / "tokens.txt", asset / "tokens.txt")
        shutil.copy(cfg["stats_file"], asset / "feats_stats.npz")
        (asset / "RESULTS.json").write_text(json.dumps(out))
        print("asset written to", asset)


if __name__ == "__main__":
    main()
