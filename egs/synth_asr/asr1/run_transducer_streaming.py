#!/usr/bin/env python3
"""Streaming Conformer-Transducer recipe (BASELINE configs[3]).

Chunked-causal StreamingConformerEncoder + RNN prediction network +
RNN-T loss trained on the synthetic corpus, then decoded with the TRUE
streaming transducer path: StreamingFeatureExtractor windows ->
GlobalMVN -> encoder.stream_step -> greedy_stream_step (prediction-net
state and hypothesis persist across chunks) — the TPU analogue of the
reference's streaming TEDLIUM2 transducer (BASELINE.md configs[3],
beam_search_transducer_streaming.py role).

Stages: 1 data (reuses asr1 work/data), 2 stats, 3 train, 4 streaming
decode + WER + latency.
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
    ap.add_argument("--workdir", default=str(HERE / "work_transducer"))
    ap.add_argument("--datadir", default=str(HERE / "work" / "data"))
    ap.add_argument("--n_train", type=int, default=2000)
    ap.add_argument("--n_valid", type=int, default=100)
    ap.add_argument("--max_epoch", type=int, default=40)
    ap.add_argument("--chunk_ms", type=float, default=640.0)
    ap.add_argument("--asset_dir", default=str(ROOT / "assets" /
                                               "synth_asr_transducer"))
    args = ap.parse_args()
    work = Path(args.workdir)
    data = Path(args.datadir)

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(work / "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    stats = work / "stats"
    exp = work / "exp" / "transducer_streaming"
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
        "decoder": "rnn",
        "decoder_conf": {"hidden_size": 256},
        "joint_conf": {"joint_space_size": 256},
        "model_conf": {"aux_ctc_weight": 0.3},
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

    from espnet_tpu.tasks.asr_transducer import ASRTransducerTask

    if args.stage <= 1 <= args.stop_stage:
        print("=== stage 1: data ===", flush=True)
        if not (data / "tokens.txt").exists():
            from espnet_tpu.data.synth_speech import SynthSpeechCorpus
            corpus = SynthSpeechCorpus()
            corpus.materialize(data, n_train=args.n_train,
                               n_valid=args.n_valid, n_test=0)
            (data / "tokens.txt").write_text(
                "\n".join(["<blank>"] + corpus.char_vocab
                          + ["<space>", "<sos/eos>"]) + "\n",
                encoding="utf-8")

    if args.stage <= 2 <= args.stop_stage:
        print("=== stage 2: collect stats ===", flush=True)
        ASRTransducerTask.main(dict(cfg, output_dir=str(stats),
                                    collect_stats=True,
                                    train_shape_file=[],
                                    valid_shape_file=[]))

    if args.stage <= 3 <= args.stop_stage:
        print("=== stage 3: train ===", flush=True)
        ASRTransducerTask.main(dict(cfg, output_dir=str(exp)))

    if args.stage <= 4 <= args.stop_stage:
        print("=== stage 4: TRUE streaming transducer decode ===",
              flush=True)
        import jax.numpy as jnp
        import numpy as np

        from espnet_tpu.data.fileio import (SoundScpReader,
                                            read_2columns_text)
        from espnet_tpu.decode.transducer_search import (
            greedy_stream_init, greedy_stream_step)
        from espnet_tpu.frontends.streaming import (
            StreamingFeatureExtractor, subsample_window,
            subsampled_valid_len)
        from espnet_tpu.text.tokenizer import TokenIDConverter
        from espnet_tpu.utils.native import score_corpus
        model_file = next(exp.glob("valid.loss.ave_*best"),
                          exp / "valid.loss.best")
        model, params, mcfg = ASRTransducerTask.build_model_from_file(
            exp / "config.yaml", model_file)
        conv = TokenIDConverter(
            [t for t in (data / "tokens.txt").read_text().split("\n")
             if t])
        fc = mcfg["frontend_conf"]
        ec = mcfg["encoder_conf"]
        W, A = subsample_window(4, ec["chunk_size"])
        mvn = model.normalize_stats

        def _stream(p, f, st):
            f, _ = mvn(f, jnp.full((f.shape[0],), f.shape[1], jnp.int32))
            return model.apply(p, f, st,
                               method=lambda m, f_, st_:
                               m.encoder_mod.stream_step(f_, st_))

        stream_step = jax.jit(_stream)
        import functools
        gstep = jax.jit(functools.partial(greedy_stream_step, model))
        chunk = int(16000 * args.chunk_ms / 1000.0)
        reader = SoundScpReader(data / "valid" / "wav.scp")
        texts = read_2columns_text(data / "valid" / "text")
        refs, hyps, lats = [], [], []
        for k in sorted(reader.keys()):
            _, audio = reader[k]
            audio = np.asarray(audio, np.float32)
            fe = StreamingFeatureExtractor(
                n_fft=fc["n_fft"], hop_length=fc["hop_length"],
                n_mels=fc["n_mels"], fs=16000)
            enc_state = model.apply(
                params, 1,
                method=lambda m, b: m.encoder_mod.init_stream_state(b))
            dec_state = greedy_stream_init(model, params, 1, umax=128)
            for i in range(0, len(audio), chunk):
                is_final = i + chunk >= len(audio)
                t0 = time.perf_counter()
                fe.push(audio[i:i + chunk], is_final=is_final)
                while True:
                    popped = fe.pop_one_window(W, A, is_final=is_final,
                                               with_valid=True)
                    if popped is None:
                        break
                    win, n_valid = popped
                    enc, enc_state = stream_step(
                        params, jnp.asarray(win[None]), enc_state)
                    # fixed shapes: full chunk in, valid length masks
                    n_out = subsampled_valid_len(4, n_valid)
                    dec_state = gstep(
                        params, enc, jnp.asarray([n_out], jnp.int32),
                        dec_state)
                lats.append(time.perf_counter() - t0)
            n_tok = int(np.asarray(dec_state.n_tok)[0])
            ids = np.asarray(dec_state.tokens)[0, :n_tok].tolist()
            toks = conv.ids2tokens(ids)
            hyps.append("".join(toks).replace("<space>", " ").strip())
            refs.append(texts[k])
        wer = score_corpus(refs, hyps, unit="word")
        cer = score_corpus(refs, hyps, unit="char")
        lats_np = np.asarray(lats[4:])
        out = {"wer": wer["err_rate"], "cer": cer["err_rate"],
               "n_utts": len(refs), "chunk_ms": args.chunk_ms,
               "chunk_latency_ms_p50": float(
                   np.percentile(lats_np, 50) * 1000)}
        print(f"streaming transducer WER: {wer['err_rate'] * 100:.2f}%  "
              f"CER: {cer['err_rate'] * 100:.2f}%  p50 "
              f"{out['chunk_latency_ms_p50']:.1f} ms", flush=True)
        (work / "RESULTS.json").write_text(json.dumps(out))
        import shutil

        import numpy as _np

        from espnet_tpu.train.checkpoint import load_checkpoint
        asset = Path(args.asset_dir)
        asset.mkdir(parents=True, exist_ok=True)
        p2, _, _ = load_checkpoint(model_file)
        flat = {}

        def _flat(t, pre=()):
            if isinstance(t, dict):
                for kk, v in t.items():
                    _flat(v, pre + (kk,))
            else:
                flat["/".join(pre)] = _np.asarray(t)
        _flat(p2)
        comp = {k: (v.astype(_np.float16) if v.dtype == _np.float32
                    else v) for k, v in flat.items()}
        _np.savez_compressed(asset / "params_f16.npz", **comp)
        shutil.copy(exp / "config.yaml", asset / "config.yaml")
        shutil.copy(data / "tokens.txt", asset / "tokens.txt")
        shutil.copy(cfg["stats_file"], asset / "feats_stats.npz")
        (asset / "RESULTS.json").write_text(json.dumps(out))
        print("asset written to", asset)


if __name__ == "__main__":
    main()
