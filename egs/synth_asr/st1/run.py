#!/usr/bin/env python3
"""Speech-translation recipe on the synthetic corpus.

The egs2/TEMPLATE/st1 stand-in for this offline environment: the
"target language" is a deterministic transformation of the source —
each source word maps to a pseudo-target word from a separately-seeded
lexicon and the word order is REVERSED, so the attention decoder must
learn a genuine (non-monotonic) vocabulary mapping + reordering, not a
copy. Headline metric is corpus BLEU (the reference scores ST with
sacrebleu in st.sh stage 15).

Stages: 1 data (speech + src_text + translated text), 2 train
(STTask: conformer encoder, transformer decoder, aux src CTC),
3 beam decode + BLEU, 4 export asset.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
ROOT = HERE.parents[2]
sys.path.insert(0, str(ROOT))


def target_lexicon(words):
    """Deterministic source->target word map (separately-seeded CV
    lexicon, same size, collision-free)."""
    import numpy as np
    rng = np.random.RandomState(31)
    cons, vows = list("ptkbdgmnszrl"), list("aeiou")
    out, seen = [], set()
    while len(out) < len(words):
        n = rng.randint(1, 4)
        w = "".join(rng.choice(cons) + rng.choice(vows) for _ in range(n))
        if w not in seen:
            seen.add(w)
            out.append(w)
    return dict(zip(words, out))


def translate(text, lex):
    return " ".join(lex[w] for w in reversed(text.split()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=1)
    ap.add_argument("--stop_stage", type=int, default=4)
    ap.add_argument("--workdir", default=str(HERE / "work"))
    ap.add_argument("--n_train", type=int, default=2000)
    ap.add_argument("--n_valid", type=int, default=60)
    ap.add_argument("--n_test", type=int, default=50)
    ap.add_argument("--max_epoch", type=int, default=25)
    ap.add_argument("--device", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--asset_dir", default=str(ROOT / "assets" /
                                               "synth_st"))
    args = ap.parse_args()
    work = Path(args.workdir)
    data = work / "data"
    exp = work / "exp" / "st"

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
        "frontend_conf": {"n_fft": 512, "hop_length": 128, "n_mels": 80},
        "specaug": "specaug",
        "specaug_conf": {"time_mask_width_range": 40, "num_time_mask": 2,
                         "freq_mask_width_range": 20, "num_freq_mask": 2},
        "normalize": "utterance_mvn",
        "encoder": "conformer",
        "encoder_conf": {"output_size": 192, "attention_heads": 4,
                         "linear_units": 768, "num_blocks": 6,
                         "input_layer": "conv2d"},
        "decoder": "transformer",
        "decoder_conf": {"attention_heads": 4, "linear_units": 768,
                         "num_blocks": 3},
        "model_conf": {"asr_weight": 0.3, "lsm_weight": 0.1},
        "optim": "adam",
        "optim_conf": {"lr": 1.5e-3},
        "scheduler": "warmuplr",
        "scheduler_conf": {"warmup_steps": 800},
        "grad_clip": 5.0,
        "batch_type": "numel",
        "batch_bins": 1_600_000,
        "max_epoch": args.max_epoch,
        "keep_nbest_models": 3,
        "patience": None,
        "log_interval": 20,
        "steps_per_dispatch": 4,
        "resume": True,
        "train_data_path_and_name_and_type": [
            f"{data}/train/wav.scp,speech,sound",
            f"{data}/train/text.tgt,text,text",
            f"{data}/train/text,src_text,text"],
        "valid_data_path_and_name_and_type": [
            f"{data}/valid/wav.scp,speech,sound",
            f"{data}/valid/text.tgt,text,text",
            f"{data}/valid/text,src_text,text"],
    }

    if args.stage <= 1 <= args.stop_stage:
        print("=== stage 1: data (speech + reversed-lexicon translation) "
              "===", flush=True)
        corpus.materialize(data, n_train=args.n_train,
                           n_valid=args.n_valid, n_test=args.n_test)
        for split in ("train", "valid", "test"):
            src = (data / split / "text").read_text().splitlines()
            with open(data / split / "text.tgt", "w") as f:
                for line in src:
                    uid, txt = line.split(" ", 1)
                    f.write(f"{uid} {translate(txt, lex)}\n")
        (data / "tokens_src.txt").write_text("\n".join(src_tokens) + "\n")
        (data / "tokens_tgt.txt").write_text("\n".join(tgt_tokens) + "\n")

    if args.stage <= 2 <= args.stop_stage:
        print("=== stage 2: train ST ===", flush=True)
        from espnet_tpu.tasks.st import STTask
        STTask.main(dict(cfg, output_dir=str(exp)))

    if args.stage <= 3 <= args.stop_stage:
        print("=== stage 3: beam decode + BLEU ===", flush=True)
        import jax.numpy as jnp
        import numpy as np

        from espnet_tpu.data.batching import bucket_length
        from espnet_tpu.data.fileio import read_2columns_text
        from espnet_tpu.decode.beam_search import (BeamSearchConfig,
                                                   _beam_search_device)
        from espnet_tpu.tasks.st import STTask
        from espnet_tpu.text.tokenizer import TokenIDConverter
        from espnet_tpu.utils.metrics import bleu

        ckpt = next(exp.glob("valid.acc.ave_*best"),
                    next(exp.glob("valid.*best"), exp))
        model, params, tcfg = STTask.build_model_from_file(
            exp / "config.yaml", ckpt)
        converter = TokenIDConverter(tgt_tokens)
        config = BeamSearchConfig(beam_size=10, ctc_weight=0.0, nbest=1)

        from espnet_tpu.data.fileio import read_wav
        wavs = read_2columns_text(data / "test" / "wav.scp")
        refs_map = read_2columns_text(data / "test" / "text.tgt")
        keys = sorted(wavs)[:args.n_test]
        audio = [read_wav(wavs[k])[1] for k in keys]
        L = bucket_length(max(len(a) for a in audio), base=4096,
                          growth=1.3)
        B = len(keys)
        speech = np.zeros((B, L), np.float32)
        lens = np.zeros((B,), np.int32)
        for j, a in enumerate(audio):
            speech[j, :len(a)] = a
            lens[j] = len(a)

        @jax.jit
        def decode(p, s, sl):
            enc, enc_lens = model.apply(p, s, sl, deterministic=True,
                                        method=model.encode)
            return _beam_search_device(p, enc, enc_lens, None, None,
                                       model=model, config=config,
                                       maxlen=enc.shape[1], lm=None,
                                       ngram=None)
        yseq, lengths, scores, n_steps = decode(
            params, jnp.asarray(speech), jnp.asarray(lens))
        yseq, lengths = np.asarray(yseq), np.asarray(lengths)
        hyps = []
        for b in range(B):
            r = b * config.beam_size
            ids = yseq[r, 1:1 + lengths[r]].tolist()
            if ids and ids[-1] == model.eos_id:
                ids = ids[:-1]
            toks = converter.ids2tokens(ids)
            hyps.append("".join(toks).replace("<space>", " ").strip())
        refs = [refs_map[k] for k in keys]
        res = bleu(refs, hyps)
        from espnet_tpu.utils.metrics import wer as _wer
        res["wer"] = _wer(refs, hyps)
        print(f"ST BLEU: {res['bleu']:.2f}  (WER {res['wer']*100:.2f}%, "
              f"{B} utts)", flush=True)
        (work / "RESULTS.json").write_text(json.dumps(
            {"st_bleu": res["bleu"], "st_wer": res["wer"],
             "n_utts": B}))

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
