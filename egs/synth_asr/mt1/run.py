#!/usr/bin/env python3
"""Machine-translation recipe on the synthetic lexicon.

The egs2/TEMPLATE/mt1 stand-in for this offline environment: source
sentences are the ASR corpus transcripts (text-only draws, no waveform
cost) and the "target language" uses the SAME reversed-lexicon
transform as the st1 recipe (word-for-word pseudo-target lexicon,
word order reversed), so an MT model trained here decodes the identical
task st1's speech path does — a genuine vocabulary mapping + reordering
the transformer must learn end-to-end. Headline metric is corpus BLEU
(the reference scores MT with sacrebleu in mt.sh stage 13).

Stages: 1 data (text pairs + shape files), 2 train (MTTask: embed
transformer encoder + transformer decoder), 3 batched beam decode +
BLEU, 4 export asset.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
ROOT = HERE.parents[2]
sys.path.insert(0, str(ROOT))

sys.path.insert(0, str(HERE.parent / "st1"))
from run import target_lexicon, translate  # noqa: E402  (st1 transform)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=1)
    ap.add_argument("--stop_stage", type=int, default=4)
    ap.add_argument("--workdir", default=str(HERE / "work"))
    ap.add_argument("--n_train", type=int, default=4000)
    ap.add_argument("--n_valid", type=int, default=100)
    ap.add_argument("--n_test", type=int, default=100)
    ap.add_argument("--max_epoch", type=int, default=30)
    ap.add_argument("--device", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--asset_dir", default=str(ROOT / "assets" /
                                               "synth_mt"))
    args = ap.parse_args()
    work = Path(args.workdir)
    data = work / "data"
    exp = work / "exp" / "mt"

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
    lex = target_lexicon(corpus.words)
    src_tokens = ["<blank>"] + corpus.char_vocab + ["<space>", "<sos/eos>"]
    tgt_chars = sorted({c for w in lex.values() for c in w})
    tgt_tokens = ["<blank>"] + tgt_chars + ["<space>", "<sos/eos>"]

    cfg = {
        "token_list": str(data / "tokens_tgt.txt"),
        "src_token_list": str(data / "tokens_src.txt"),
        "token_type": "char",
        "src_token_type": "char",
        "encoder_conf": {"output_size": 256, "attention_heads": 4,
                         "linear_units": 1024, "num_blocks": 4,
                         "input_layer": "embed"},
        "decoder_conf": {"attention_heads": 4, "linear_units": 1024,
                         "num_blocks": 4},
        "model_conf": {"lsm_weight": 0.1},
        "optim": "adam",
        "optim_conf": {"lr": 1.5e-3},
        "scheduler": "warmuplr",
        "scheduler_conf": {"warmup_steps": 600},
        "grad_clip": 5.0,
        "batch_type": "unsorted", "batch_size": 64,
        "collate_fixed_lengths": {"text": 96, "src_text": 96},
        "max_epoch": args.max_epoch,
        "keep_nbest_models": 3,
        "patience": None,
        "log_interval": 20,
        "steps_per_dispatch": 8,
        "resume": True,
        "train_data_path_and_name_and_type": [
            f"{data}/train/text.tgt,text,text",
            f"{data}/train/text.src,src_text,text"],
        "valid_data_path_and_name_and_type": [
            f"{data}/valid/text.tgt,text,text",
            f"{data}/valid/text.src,src_text,text"],
        "train_shape_file": [f"{data}/train/text_shape"],
        "valid_shape_file": [f"{data}/valid/text_shape"],
    }

    if args.stage <= 1 <= args.stop_stage:
        print("=== stage 1: text pairs (reversed-lexicon translation) ===",
              flush=True)
        for split, n in (("train", args.n_train), ("valid", args.n_valid),
                         ("test", args.n_test)):
            d = data / split
            d.mkdir(parents=True, exist_ok=True)
            with open(d / "text.src", "w") as fsrc, \
                    open(d / "text.tgt", "w") as ftgt, \
                    open(d / "text_shape", "w") as fsh:
                for i in range(n):
                    src, _ = corpus.transcript(f"mt-{split}", i)
                    tgt = translate(src, lex)
                    uid = f"{split}_{i:06d}"
                    fsrc.write(f"{uid} {src}\n")
                    ftgt.write(f"{uid} {tgt}\n")
                    fsh.write(f"{uid} {len(tgt)}\n")
        (data / "tokens_src.txt").write_text("\n".join(src_tokens) + "\n")
        (data / "tokens_tgt.txt").write_text("\n".join(tgt_tokens) + "\n")

    if args.stage <= 2 <= args.stop_stage:
        print("=== stage 2: train MT ===", flush=True)
        from espnet_tpu.tasks.st import MTTask
        MTTask.main(dict(cfg, output_dir=str(exp)))

    if args.stage <= 3 <= args.stop_stage:
        print("=== stage 3: batched beam decode + BLEU ===", flush=True)
        import jax.numpy as jnp
        import numpy as np

        from espnet_tpu.data.fileio import read_2columns_text
        from espnet_tpu.decode.beam_search import (BeamSearchConfig,
                                                   _beam_search_device)
        from espnet_tpu.tasks.st import MTTask
        from espnet_tpu.text.tokenizer import TokenIDConverter
        from espnet_tpu.utils.metrics import bleu
        from espnet_tpu.utils.metrics import wer as _wer

        ckpt = next(exp.glob("valid.acc.ave_*best"),
                    next(exp.glob("valid.*best"), exp))
        model, params, _ = MTTask.build_model_from_file(
            exp / "config.yaml", ckpt)
        src_conv = TokenIDConverter(src_tokens)
        tgt_conv = TokenIDConverter(tgt_tokens)
        config = BeamSearchConfig(beam_size=10, ctc_weight=0.0, nbest=1)

        srcs = read_2columns_text(data / "test" / "text.src")
        refs_map = read_2columns_text(data / "test" / "text.tgt")
        keys = sorted(srcs)[:args.n_test]
        B, L = len(keys), 96
        src = np.zeros((B, L), np.int32)
        src_lens = np.zeros((B,), np.int32)
        for j, k in enumerate(keys):
            toks = [c if c != " " else "<space>" for c in srcs[k]][:L]
            ids = src_conv.tokens2ids(toks)
            src[j, :len(ids)] = ids
            src_lens[j] = len(ids)

        @jax.jit
        def decode(p, s, sl):
            enc, enc_lens = model.apply(p, s, sl, deterministic=True,
                                        method=model.encode)
            return _beam_search_device(p, enc, enc_lens, None, None,
                                       model=model, config=config,
                                       maxlen=enc.shape[1], lm=None,
                                       ngram=None)
        yseq, lengths, scores, n_steps = decode(
            params, jnp.asarray(src), jnp.asarray(src_lens))
        yseq, lengths = np.asarray(yseq), np.asarray(lengths)
        hyps = []
        for b in range(B):
            r = b * config.beam_size
            ids = yseq[r, 1:1 + lengths[r]].tolist()
            if ids and ids[-1] == model.eos_id:
                ids = ids[:-1]
            toks = tgt_conv.ids2tokens(ids)
            hyps.append("".join(toks).replace("<space>", " ").strip())
        refs = [refs_map[k] for k in keys]
        res = bleu(refs, hyps)
        res["wer"] = _wer(refs, hyps)
        print(f"MT BLEU: {res['bleu']:.2f}  (WER {res['wer']*100:.2f}%, "
              f"{B} sents)", flush=True)
        (work / "RESULTS.json").write_text(json.dumps(
            {"mt_bleu": res["bleu"], "mt_wer": res["wer"], "n_sents": B}))

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
        shutil.copy(data / "tokens_tgt.txt", asset / "tokens_tgt.txt")
        shutil.copy(data / "tokens_src.txt", asset / "tokens_src.txt")
        if (work / "RESULTS.json").exists():
            shutil.copy(work / "RESULTS.json", asset / "RESULTS.json")


if __name__ == "__main__":
    main()
