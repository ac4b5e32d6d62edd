#!/usr/bin/env python3
"""Language-model recipe on the synthetic corpus text.

The egs2 LM stage stand-in (asr.sh stages 6-9: lm data prep -> train ->
perplexity): train a char transformer LM on the corpus' Zipf-weighted
word sequences and report held-out perplexity, then prove the decode
integration by rescoring the flagship ASR's beam with the trained LM
(shallow fusion, asr_inference --lm_* flags).

Stages: 1 data (text only), 2 train (LMTask), 3 perplexity,
4 LM-fused ASR decode, 5 export asset.
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
    ap.add_argument("--stop_stage", type=int, default=5)
    ap.add_argument("--workdir", default=str(HERE / "work"))
    ap.add_argument("--n_train", type=int, default=6000)
    ap.add_argument("--n_valid", type=int, default=300)
    ap.add_argument("--max_epoch", type=int, default=15)
    ap.add_argument("--n_decode", type=int, default=64)
    ap.add_argument("--device", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--asset_dir", default=str(ROOT / "assets" /
                                               "synth_lm"))
    args = ap.parse_args()
    work = Path(args.workdir)
    data = work / "data"
    exp = work / "exp" / "lm"

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

    cfg = {
        "token_list": str(data / "tokens.txt"),
        "token_type": "char",
        "lm": "transformer",
        "lm_conf": {"att_unit": 256, "head": 4, "unit": 1024,
                    "layer": 4, "dropout_rate": 0.1},
        "optim": "adam", "optim_conf": {"lr": 1e-3},
        "scheduler": "warmuplr", "scheduler_conf": {"warmup_steps": 400},
        "grad_clip": 5.0,
        "batch_type": "unsorted", "batch_size": 64,
        "collate_fixed_lengths": {"text": 64},
        "max_epoch": args.max_epoch,
        "keep_nbest_models": 2, "patience": None,
        "log_interval": 20, "steps_per_dispatch": 8, "resume": True,
        "train_data_path_and_name_and_type": [
            f"{data}/train/text,text,text"],
        "valid_data_path_and_name_and_type": [
            f"{data}/valid/text,text,text"],
        "train_shape_file": [f"{data}/train/text_shape"],
        "valid_shape_file": [f"{data}/valid/text_shape"],
    }

    if args.stage <= 1 <= args.stop_stage:
        print("=== stage 1: text data ===", flush=True)
        for split, n in (("train", args.n_train), ("valid", args.n_valid)):
            d = data / split
            d.mkdir(parents=True, exist_ok=True)
            with open(d / "text", "w") as f, \
                    open(d / "text_shape", "w") as fs:
                for i in range(n):
                    # text-only draw: same generator, no waveform cost
                    rng = corpus._rng_for(f"lmtext-{split}", i)
                    n_w = rng.randint(corpus.min_words,
                                      corpus.max_words + 1)
                    widx = rng.choice(len(corpus.words), size=n_w,
                                      p=corpus.word_p)
                    sent = " ".join(corpus.words[j] for j in widx)
                    f.write(f"{split}_{i:06d} {sent}\n")
                    # char tokens incl. word separators (sampler key)
                    fs.write(f"{split}_{i:06d} {len(sent)}\n")
        (data / "tokens.txt").write_text("\n".join(token_list) + "\n")

    if args.stage <= 2 <= args.stop_stage:
        print("=== stage 2: train LM ===", flush=True)
        from espnet_tpu.tasks.lm import LMTask
        LMTask.main(dict(cfg, output_dir=str(exp)))

    ckpt = None
    if args.stage <= 5:
        ckpt = next(exp.glob("valid.loss.ave_*best"),
                    exp / "valid.loss.best")

    if args.stage <= 3 <= args.stop_stage:
        print("=== stage 3: perplexity ===", flush=True)
        from espnet_tpu.bin.lm_calc_perplexity import calc_perplexity
        ppl = calc_perplexity(
            train_config=str(exp / "config.yaml"),
            model_file=str(ckpt),
            data_path_and_name_and_type=[f"{data}/valid/text,text,text"],
            batch_size=64)
        print(f"valid perplexity: {ppl:.3f}", flush=True)
        (work / "RESULTS.json").write_text(json.dumps(
            {"valid_ppl": float(ppl)}))

    if args.stage <= 4 <= args.stop_stage:
        print("=== stage 4: LM-fused ASR decode ===", flush=True)
        import numpy as np

        from espnet_tpu.bin.asr_inference import Speech2Text
        from espnet_tpu.data.batching import bucket_length
        from espnet_tpu.utils.native import score_corpus

        asset = ROOT / "assets" / "synth_asr_flagship"
        utts = [corpus.utterance("test", i) for i in range(args.n_decode)]
        refs = [u[1] for u in utts]
        L = bucket_length(max(len(u[0]) for u in utts), base=4096,
                          growth=1.3)
        B = len(utts)
        speech = np.zeros((B, L), np.float32)
        lens = np.zeros((B,), np.int32)
        for j, (w, _, _) in enumerate(utts):
            speech[j, :len(w)] = w
            lens[j] = len(w)
        results = {}
        for tag, lw in (("no_lm", 0.0), ("lm_0.3", 0.3)):
            s2t = Speech2Text(
                asr_train_config=asset / "config.yaml",
                asr_model_file=asset, beam_size=10, ctc_weight=0.3,
                lm_train_config=(exp / "config.yaml") if lw else None,
                lm_file=ckpt if lw else None, lm_weight=lw)
            nb = s2t(speech, lens)
            hyps = [n[0][0] for n in nb]
            results[tag] = score_corpus(refs, hyps,
                                        unit="word")["err_rate"]
            print(f"{tag}: WER {results[tag]*100:.2f}%", flush=True)
        res = json.loads((work / "RESULTS.json").read_text()) \
            if (work / "RESULTS.json").exists() else {}
        res.update({"wer_no_lm": results["no_lm"],
                    "wer_lm": results["lm_0.3"]})
        (work / "RESULTS.json").write_text(json.dumps(res))

    if args.stage <= 5 <= args.stop_stage:
        print("=== stage 5: export asset ===", flush=True)
        import shutil

        import numpy as np

        from espnet_tpu.train.checkpoint import load_checkpoint

        asset = Path(args.asset_dir)
        asset.mkdir(parents=True, exist_ok=True)
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
