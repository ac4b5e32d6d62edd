#!/usr/bin/env python3
"""SpeechLM recipe: neural-codec tokens -> speech-continuation LM.

The VERDICT-r2 #4 "make SpeechLM a subsystem" close-out: train the
in-repo neural codec (models/codec.py SoundStream-lite, recon+mel+
commit objective) on the synthetic corpus, tokenize the corpus into
(T, Q) residual-VQ codes, train the delay-pattern multi-stream SpeechLM
(models/speechlm.py) on audio continuation, then evaluate held-out
teacher-forced perplexity and generate prompted continuations through
the codec decoder (bin/speechlm_inference.py).

Reference shape: espnet2/speechlm/ (dataloader JSONs, multimodal vocab,
bin/train.py + bin/inference.py); egs2 speechlm recipes tokenize with a
pretrained codec — offline here, so the codec is trained in-recipe.

Stages: 1 data, 2 codec train, 3 tokenize + dataset JSONs,
4 speechlm train, 5 eval (ppl/acc), 6 generation demo, 7 export assets.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
ROOT = HERE.parents[2]
sys.path.insert(0, str(ROOT))

UTT_SAMPLES = 74656          # fixed synth-corpus utterance length


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=1)
    ap.add_argument("--stop_stage", type=int, default=7)
    ap.add_argument("--workdir", default=str(HERE / "work"))
    ap.add_argument("--n_train", type=int, default=2000)
    ap.add_argument("--n_valid", type=int, default=100)
    ap.add_argument("--codec_epochs", type=int, default=12)
    ap.add_argument("--lm_epochs", type=int, default=15)
    ap.add_argument("--device", default="tpu", choices=["cpu", "tpu"])
    args = ap.parse_args()
    work = Path(args.workdir)
    data = work / "data"
    codec_exp = work / "exp" / "codec"
    lm_exp = work / "exp" / "speechlm"

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(work / "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    import numpy as np

    from espnet_tpu.data.synth_speech import SynthSpeechCorpus
    corpus = SynthSpeechCorpus()
    token_list = (["<blank>"] + corpus.char_vocab + ["<space>",
                                                     "<sos/eos>"])

    # codec: strides (2,4,5,8) -> hop 320 = 50 Hz code frames
    codec_cfg = {
        "fs": 16000,
        "codec_conf": {"channels": 32, "strides": (2, 4, 5, 8),
                       "code_dim": 128, "num_quantizers": 4,
                       "codebook_size": 256},
        "optim": "adam", "optim_conf": {"lr": 3e-4},
        "batch_type": "sorted", "batch_size": 8,
        "collate_fixed_lengths": {"speech": UTT_SAMPLES},
        "max_epoch": args.codec_epochs,
        "keep_nbest_models": 2, "patience": None,
        "log_interval": 50, "steps_per_dispatch": 8, "resume": True,
        "train_data_path_and_name_and_type": [
            f"{data}/train/wav.scp,speech,sound"],
        "valid_data_path_and_name_and_type": [
            f"{data}/valid/wav.scp,speech,sound"],
    }

    n_frames = UTT_SAMPLES // 320                 # 233 code frames
    lm_len = 2 + (n_frames + 3) + 1               # bos+tag, delay Q-1, eos
    lm_cfg = {
        "multi_task_dataset": [str(data / "train_continuation.json")],
        "valid_multi_task_dataset": [
            str(data / "valid_continuation.json")],
        "text_token_list": str(data / "tokens.txt"),
        "codebook_size": 256, "n_streams": 4,
        "d_model": 256, "heads": 4, "units": 1024, "layers": 4,
        "optim": "adam", "optim_conf": {"lr": 3e-4},
        "scheduler": "warmuplr", "scheduler_conf": {"warmup_steps": 500},
        "grad_clip": 5.0,
        "batch_type": "unsorted", "batch_size": 16,
        "collate_fixed_lengths": {"tokens": lm_len, "loss_mask": lm_len},
        "max_epoch": args.lm_epochs,
        "keep_nbest_models": 2, "patience": None,
        "log_interval": 20, "steps_per_dispatch": 8, "resume": True,
        "train_data_path_and_name_and_type": [],
        "valid_data_path_and_name_and_type": [],
    }

    if args.stage <= 1 <= args.stop_stage:
        print("=== stage 1: data ===", flush=True)
        corpus.materialize(data, n_train=args.n_train,
                           n_valid=args.n_valid, n_test=0)
        (data / "tokens.txt").write_text("\n".join(token_list) + "\n",
                                         encoding="utf-8")

    if args.stage <= 2 <= args.stop_stage:
        print("=== stage 2: train codec ===", flush=True)
        from espnet_tpu.tasks.ssl import CodecTask
        CodecTask.main(dict(codec_cfg, output_dir=str(codec_exp)))

    if args.stage <= 3 <= args.stop_stage:
        print("=== stage 3: tokenize + dataset JSONs ===", flush=True)
        import jax.numpy as jnp

        from espnet_tpu.data.fileio import NpyScpWriter, SoundScpReader
        from espnet_tpu.data.speechlm import write_dataset_json
        from espnet_tpu.tasks.ssl import CodecTask

        ckpt = next(codec_exp.glob("valid.loss.ave_*best"),
                    codec_exp / "valid.loss.best")
        model, params, _ = CodecTask.build_model_from_file(
            codec_exp / "config.yaml", ckpt)
        S = (UTT_SAMPLES // model.hop) * model.hop
        enc = jax.jit(lambda p, w: model.apply(p, w, method=model.encode))
        B = 32
        for split in ("train", "valid"):
            reader = SoundScpReader(data / split / "wav.scp")
            keys = list(reader.keys())
            cdir = data / split / "codes"
            with NpyScpWriter(cdir, data / split / "codes.scp") as w:
                for i in range(0, len(keys), B):
                    chunk = keys[i:i + B]
                    wavs = []
                    for k in chunk:
                        _, wav = reader[k]
                        wav = np.asarray(wav, np.float32)[:S]
                        wavs.append(np.pad(wav, (0, S - len(wav))))
                    pad = B - len(chunk)
                    if pad:
                        wavs += [np.zeros((S,), np.float32)] * pad
                    codes = np.asarray(enc(params, jnp.asarray(
                        np.stack(wavs))))
                    for j, k in enumerate(chunk):
                        w[k] = codes[j].astype(np.int32)
            write_dataset_json(
                data / f"{split}_continuation.json", "audio_continuation",
                [{"name": "audio1", "path": str(data / split /
                                                "codes.scp"),
                  "type": "npy"}],
                keys)

    if args.stage <= 4 <= args.stop_stage:
        print("=== stage 4: train speechlm ===", flush=True)
        from espnet_tpu.tasks.speechlm import SpeechLMTask
        SpeechLMTask.main(dict(lm_cfg, output_dir=str(lm_exp)))

    results = {}
    if args.stage <= 5 <= args.stop_stage:
        print("=== stage 5: held-out teacher-forced ppl ===", flush=True)
        import jax.numpy as jnp

        from espnet_tpu.data.speechlm import MultiTaskSpeechLMDataset
        from espnet_tpu.tasks.speechlm import (SpeechLMTask,
                                               build_vocab_from_cfg)
        ckpt = next(lm_exp.glob("valid.loss.ave_*best"),
                    lm_exp / "valid.loss.best")
        model, params, cfg = SpeechLMTask.build_model_from_file(
            lm_exp / "config.yaml", ckpt)
        vocab, t2i = build_vocab_from_cfg(cfg)
        ds = MultiTaskSpeechLMDataset(
            [str(data / "valid_continuation.json")], vocab,
            text_to_ids=t2i)
        nll_fn = jax.jit(lambda p, b: model.apply(
            p, **b, deterministic=True)[1])
        tot_nll, tot_tok, tot_acc = 0.0, 0, 0.0
        keys = list(ds.keys())
        B = min(16, len(keys))
        for i in range(0, len(keys) - B + 1, B):
            toks, masks = [], []
            for k in keys[i:i + B]:
                _, ex = ds[k]
                t = np.full((lm_len, vocab.n_streams), vocab.pad,
                            np.int32)
                m = np.zeros((lm_len,), np.float32)
                L = min(len(ex["tokens"]), lm_len)
                t[:L] = ex["tokens"][:L]
                m[:L] = ex["loss_mask"][:L]
                toks.append(t)
                masks.append(m)
            b = {"tokens": jnp.asarray(np.stack(toks)),
                 "token_lengths": jnp.full((B,), lm_len, jnp.int32),
                 "loss_mask": jnp.asarray(np.stack(masks))}
            stats = nll_fn(params, b)
            n = float(np.sum(np.stack(masks)))
            tot_nll += float(stats["loss"]) * n
            tot_acc += float(stats.get("acc", 0.0)) * n
            tot_tok += n
        ppl = float(np.exp(tot_nll / max(tot_tok, 1)))
        results.update(speechlm_heldout_ppl=ppl,
                       speechlm_heldout_acc=tot_acc / max(tot_tok, 1),
                       n_scored_tokens=int(tot_tok))
        print(f"held-out ppl {ppl:.2f} acc {results['speechlm_heldout_acc']:.3f}")

    if args.stage <= 6 <= args.stop_stage:
        print("=== stage 6: prompted continuation demo ===", flush=True)
        from espnet_tpu.bin.speechlm_inference import SpeechLMInference
        from espnet_tpu.data.fileio import SoundScpReader, write_wav
        ckpt = next(lm_exp.glob("valid.loss.ave_*best"),
                    lm_exp / "valid.loss.best")
        cckpt = next(codec_exp.glob("valid.loss.ave_*best"),
                     codec_exp / "valid.loss.best")
        inf = SpeechLMInference(
            train_config=lm_exp / "config.yaml", model_file=ckpt,
            codec_train_config=codec_exp / "config.yaml",
            codec_model_file=cckpt, topk=30)
        reader = SoundScpReader(data / "valid" / "wav.scp")
        outdir = work / "generated"
        outdir.mkdir(parents=True, exist_ok=True)
        n_ok = 0
        for k in list(reader.keys())[:4]:
            _, wav = reader[k]
            prompt = np.asarray(wav, np.float32)[:16000]   # 1 s prompt
            out = inf("audio_continuation", speech=prompt, steps=120)
            if "wav" in out and len(out["wav"]):
                gen = np.asarray(out["wav"], np.float32)
                write_wav(outdir / f"{k}_cont.wav", 16000,
                          np.concatenate([prompt, gen]))
                if float(np.sqrt(np.mean(gen ** 2))) > 1e-3:
                    n_ok += 1
        results["n_continuations_nonsilent"] = n_ok
        print(f"continuations generated, non-silent: {n_ok}/4")

    if args.stage <= 7 <= args.stop_stage and results:
        print("=== stage 7: export assets ===", flush=True)
        import shutil

        from espnet_tpu.train.checkpoint import load_checkpoint

        def _flatten(tree, prefix=()):
            out = {}
            for kk, v in tree.items():
                if isinstance(v, dict):
                    out.update(_flatten(v, prefix + (kk,)))
                else:
                    out[prefix + (kk,)] = v
            return out

        def export(exp, asset):
            asset.mkdir(parents=True, exist_ok=True)
            ckpt = next(exp.glob("valid.loss.ave_*best"),
                        exp / "valid.loss.best")
            params, _, _ = load_checkpoint(ckpt)
            flat = {"/".join(map(str, kk)): np.asarray(v)
                    for kk, v in _flatten(params).items()}
            comp = {kk: (v.astype(np.float16) if v.dtype == np.float32
                         else v) for kk, v in flat.items()}
            np.savez_compressed(asset / "params_f16.npz", **comp)
            shutil.copy(exp / "config.yaml", asset / "config.yaml")

        export(codec_exp, ROOT / "assets" / "synth_codec")
        export(lm_exp, ROOT / "assets" / "synth_speechlm")
        (ROOT / "assets" / "synth_speechlm" /
         "RESULTS.json").write_text(json.dumps(results, indent=1))
        (work / "RESULTS.json").write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
