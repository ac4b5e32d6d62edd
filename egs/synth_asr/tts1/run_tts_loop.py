#!/usr/bin/env python3
"""TTS -> ASR intelligibility loop on the synthetic corpus.

Objective TTS evidence without human listeners: train FastSpeech2 on the
same multi-speaker formant corpus the ASR flagship was trained on, then
synthesize the held-out texts with Text2Speech (griffin-lim) and
transcribe them with the TRAINED flagship ASR
(assets/synth_asr_flagship). The resulting "TTS-ASR WER" is the
standard objective intelligibility proxy (the reference's TTS recipes
report the same loop via an external ASR, e.g. egs2 ljspeech
tts1 RESULTS evaluation protocol).

Stages: 1 data (reuses egs/synth_asr/asr1 work/data), 2 train TTS,
3 synthesize + ASR-transcribe + WER.
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
    ap.add_argument("--stop_stage", type=int, default=7)
    ap.add_argument("--workdir", default=str(HERE / "work"))
    ap.add_argument("--datadir",
                    default=str(HERE.parent / "asr1" / "work" / "data"))
    ap.add_argument("--n_train", type=int, default=2000)
    ap.add_argument("--n_valid", type=int, default=100)
    ap.add_argument("--n_eval", type=int, default=50)
    ap.add_argument("--max_epoch", type=int, default=30)
    ap.add_argument("--vocoder_epochs", type=int, default=60)
    ap.add_argument("--asr_asset", default=str(ROOT / "assets" /
                                               "synth_asr_flagship"))
    ap.add_argument("--single_speaker", action="store_true",
                    help="LJSpeech-like one-voice corpus (speaker 0)")
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

    exp = work / "exp" / "tts_fastspeech2"

    def ensure_sids(split):
        """utt2spk 'spkNN' -> numeric sid file for the sids data column."""
        src = data / split / "utt2spk"
        dst = data / split / "utt2sid"
        if src.exists() and not dst.exists():
            lines = []
            for ln in src.read_text(encoding="utf-8").splitlines():
                if ln.strip():
                    uid, spk = ln.split()
                    lines.append(f"{uid} {int(''.join(filter(str.isdigit, spk)))}")
            dst.write_text("\n".join(lines) + "\n", encoding="utf-8")
        return dst

    cfg = {
        "token_list": str(data / "tokens.txt"),
        "token_type": "char",
        "feats_extract": "fbank",
        "feats_extract_conf": {"fs": 16000, "n_fft": 512,
                               "hop_length": 128, "n_mels": 80},
        "tts": "fastspeech2",
        "spk_num": 24,
        "tts_conf": {"adim": 192, "aheads": 2, "elayers": 4, "dlayers": 4,
                     "eunits": 768, "dunits": 768},
        "optim": "adam",
        "optim_conf": {"lr": 0.001},
        "scheduler": "warmuplr",
        "scheduler_conf": {"warmup_steps": 400},
        "grad_clip": 1.0,
        "batch_type": "sorted",
        "batch_size": 16,
        "collate_fixed_lengths": {"speech": 74656, "text": 64},
        "max_epoch": args.max_epoch,
        "keep_nbest_models": 3,
        "patience": None,
        "log_interval": 20,
        "train_data_path_and_name_and_type": [
            f"{data}/train/wav.scp,speech,sound",
            f"{data}/train/text,text,text",
            f"{data}/train/utt2sid,sids,text_int"],
        "valid_data_path_and_name_and_type": [
            f"{data}/valid/wav.scp,speech,sound",
            f"{data}/valid/text,text,text",
            f"{data}/valid/utt2sid,sids,text_int"],
    }

    if args.stage <= 1 <= args.stop_stage:
        print("=== stage 1: data ===", flush=True)
        if not (data / "tokens.txt").exists():
            from espnet_tpu.data.synth_speech import SynthSpeechCorpus
            corpus = SynthSpeechCorpus()
            corpus.materialize(
                data, n_train=args.n_train, n_valid=args.n_valid,
                n_test=0,
                speaker_ids=[0] if args.single_speaker else None)
            (data / "tokens.txt").write_text(
                "\n".join(["<blank>"] + corpus.char_vocab
                          + ["<space>", "<sos/eos>"]) + "\n",
                encoding="utf-8")

    if args.stage <= 2 <= args.stop_stage:
        print("=== stage 2: train FastSpeech2 ===", flush=True)
        for split in ("train", "valid"):
            ensure_sids(split)
        from espnet_tpu.tasks.tts import TTSTask
        TTSTask.main(dict(cfg, output_dir=str(exp)))

    if args.stage <= 3 <= args.stop_stage:
        print("=== stage 3: synthesize + ASR round trip ===", flush=True)
        import numpy as np

        from espnet_tpu.bin.asr_inference import Speech2Text
        from espnet_tpu.bin.tts_inference import Text2Speech
        from espnet_tpu.data.fileio import read_2columns_text, write_wav
        from espnet_tpu.utils.native import score_corpus
        t2s = Text2Speech(
            train_config=exp / "config.yaml",
            model_file=next(exp.glob("valid.loss.ave_*best"),
                            exp / "valid.loss.best"))
        asset = Path(args.asr_asset)
        s2t = Speech2Text(asr_train_config=asset / "config.yaml",
                          asr_model_file=asset, beam_size=10,
                          ctc_weight=0.3)
        texts = read_2columns_text(data / "valid" / "text")
        sid_file = data / "valid" / "utt2sid"
        sids = ({k: int(v) for k, v in read_2columns_text(
            sid_file).items()} if sid_file.exists() else {})
        keys = sorted(texts)[:args.n_eval]
        wavdir = work / "synth_wavs"
        wavdir.mkdir(parents=True, exist_ok=True)
        from espnet_tpu.data.batching import bucket_length
        refs, hyps = [], []
        for k in keys:
            out = t2s(texts[k], sid=sids.get(k))
            wav = np.asarray(out["wav"], np.float32)
            write_wav(wavdir / f"{k}.wav", 16000, wav)
            # bucketed pad: one ASR compile per bucket, not per length
            Lb = bucket_length(max(len(wav), 4096), base=4096, growth=1.3)
            nb = s2t(np.pad(wav, (0, Lb - len(wav)))[None],
                     np.asarray([len(wav)], np.int32))
            hyps.append(nb[0][0][0])
            refs.append(texts[k])
        wer = score_corpus(refs, hyps, unit="word")
        cer = score_corpus(refs, hyps, unit="char")
        print(f"TTS->ASR WER: {wer['err_rate'] * 100:.2f}%  "
              f"CER: {cer['err_rate'] * 100:.2f}%  ({len(keys)} utts)")
        (work / "RESULTS.json").write_text(json.dumps(
            {"tts_asr_wer": wer["err_rate"],
             "tts_asr_cer": cer["err_rate"], "n_utts": len(keys)}))

    voc_exp = work / "exp" / "hifigan"
    if args.stage <= 4 <= args.stop_stage:
        print("=== stage 4: train HiFiGAN vocoder (GANTrainer) ===",
              flush=True)
        from espnet_tpu.tasks.gan_tts import GANVocoderTask
        GANVocoderTask.main({
            "output_dir": str(voc_exp),
            "fs": 16000, "n_fft": 512, "hop_length": 128, "n_mels": 80,
            "generator_conf": {"channels": 128,
                               "upsample_scales": (8, 4, 4),
                               "upsample_kernel_sizes": (16, 8, 8),
                               "kernel_size": 7,
                               "resblock_kernel_sizes": (3, 7),
                               "resblock_dilations": ((1, 3), (1, 3))},
            "discriminator_conf": {"periods": (2, 3, 5), "scales": 2},
            "segment_size": 8192,
            "batch_size": 16, "max_epoch": args.vocoder_epochs,
            "steps_per_dispatch": 8,
            "keep_nbest_models": 2, "log_interval": 10,
            "resume": True,
            "train_data_path_and_name_and_type": [
                f"{data}/train/wav.scp,speech,sound"],
            "valid_data_path_and_name_and_type": [
                f"{data}/valid/wav.scp,speech,sound"],
        })

    if args.stage <= 5 <= args.stop_stage:
        print("=== stage 5: synthesize w/ NEURAL vocoder + ASR loop ===",
              flush=True)
        import numpy as np

        from espnet_tpu.bin.asr_inference import Speech2Text
        from espnet_tpu.bin.tts_inference import Text2Speech
        from espnet_tpu.data.batching import bucket_length
        from espnet_tpu.data.fileio import read_2columns_text, write_wav
        from espnet_tpu.utils.native import score_corpus
        voc_ckpt = next(voc_exp.glob("valid.loss.best"),
                        voc_exp / "checkpoint")
        t2s = Text2Speech(
            train_config=exp / "config.yaml",
            model_file=next(exp.glob("valid.loss.ave_*best"),
                            exp / "valid.loss.best"),
            vocoder_file=voc_ckpt,
            vocoder_config=voc_exp / "config.yaml")
        asset = Path(args.asr_asset)
        s2t = Speech2Text(asr_train_config=asset / "config.yaml",
                          asr_model_file=asset, beam_size=10,
                          ctc_weight=0.3)
        texts = read_2columns_text(data / "valid" / "text")
        sid_file = data / "valid" / "utt2sid"
        sids = ({k: int(v) for k, v in read_2columns_text(
            sid_file).items()} if sid_file.exists() else {})
        keys = sorted(texts)[:args.n_eval]
        wavdir = work / "synth_wavs_vocoder"
        wavdir.mkdir(parents=True, exist_ok=True)
        refs, hyps = [], []
        for k in keys:
            out = t2s(texts[k], sid=sids.get(k))
            wav = np.asarray(out["wav"], np.float32)
            write_wav(wavdir / f"{k}.wav", 16000, wav)
            Lb = bucket_length(max(len(wav), 4096), base=4096, growth=1.3)
            nb = s2t(np.pad(wav, (0, Lb - len(wav)))[None],
                     np.asarray([len(wav)], np.int32))
            hyps.append(nb[0][0][0])
            refs.append(texts[k])
        wer = score_corpus(refs, hyps, unit="word")
        cer = score_corpus(refs, hyps, unit="char")
        print(f"TTS->ASR (HiFiGAN) WER: {wer['err_rate'] * 100:.2f}%  "
              f"CER: {cer['err_rate'] * 100:.2f}%  ({len(keys)} utts)")
        res = {}
        if (work / "RESULTS.json").exists():
            res = json.loads((work / "RESULTS.json").read_text())
        res.update({"tts_asr_wer_hifigan": wer["err_rate"],
                    "tts_asr_cer_hifigan": cer["err_rate"],
                    "n_utts_hifigan": len(keys)})
        (work / "RESULTS.json").write_text(json.dumps(res))

    ft_exp = work / "exp" / "hifigan_ft"
    if args.stage <= 6 <= args.stop_stage:
        print("=== stage 6: teacher-forced mel dump + vocoder finetune ===",
              flush=True)
        # Copy-synthesis through the stage-4 vocoder is perfect (WER 0%)
        # but FastSpeech2's predicted mels are out-of-distribution for
        # it; finetune on ground-truth-aligned PREDICTED mels
        # (the reference tts.sh vocoder-finetuning stage).
        import jax
        import jax.numpy as jnp
        import numpy as np

        from espnet_tpu.data.batching import bucket_length
        from espnet_tpu.data.fileio import SoundScpReader, read_2columns_text
        from espnet_tpu.tasks.tts import TTSTask
        model, params, tcfg = TTSTask.build_model_from_file(
            exp / "config.yaml",
            next(exp.glob("valid.loss.ave_*best"), exp / "valid.loss.best"))
        from espnet_tpu.data.preprocessor import CommonPreprocessor
        pre = TTSTask.build_preprocess_fn(tcfg, train=False)
        tf_fn_cache = {}

        def tf_mel(text_ids, wav, sid=None):
            Lb = bucket_length(max(len(text_ids), 2), base=8, growth=1.3)
            Sb = bucket_length(max(len(wav), 4096), base=4096, growth=1.3)
            key = (Lb, Sb, sid is not None)
            if key not in tf_fn_cache:
                if sid is not None:
                    tf_fn_cache[key] = jax.jit(
                        lambda p, t, tl, w, wl, s: model.apply(
                            p, t, tl, w, wl, sids=s,
                            method=model.teacher_forced_mel))
                else:
                    tf_fn_cache[key] = jax.jit(
                        lambda p, t, tl, w, wl: model.apply(
                            p, t, tl, w, wl,
                            method=model.teacher_forced_mel))
            t = jnp.asarray(np.pad(text_ids, (0, Lb - len(text_ids)))[None])
            w = jnp.asarray(np.pad(wav, (0, Sb - len(wav)))[None])
            extra = ((jnp.asarray([int(sid)], jnp.int32),)
                     if sid is not None else ())
            mel, olens = tf_fn_cache[key](
                params, t, jnp.asarray([len(text_ids)], jnp.int32),
                w, jnp.asarray([len(wav)], jnp.int32), *extra)
            return np.asarray(mel)[0, :int(np.asarray(olens)[0])]

        for split in ("train", "valid"):
            texts = read_2columns_text(data / split / "text")
            reader = SoundScpReader(data / split / "wav.scp")
            sidf = data / split / "utt2sid"
            sid_map = ({k: int(v) for k, v in read_2columns_text(
                sidf).items()} if sidf.exists() else {})
            mel_dir = work / "tf_mels" / split
            mel_dir.mkdir(parents=True, exist_ok=True)
            scp_lines = []
            for k in sorted(texts):
                ids = pre("<dump>", {"text": texts[k]})["text"]
                _, wav = reader[k]
                mel = tf_mel(np.asarray(ids, np.int32),
                             np.asarray(wav, np.float32),
                             sid=sid_map.get(k))
                np.save(mel_dir / f"{k}.npy", mel)
                scp_lines.append(f"{k} {mel_dir}/{k}.npy")
            (work / f"tf_mels_{split}.scp").write_text(
                "\n".join(scp_lines) + "\n")
        from espnet_tpu.tasks.gan_tts import GANVocoderTask
        GANVocoderTask.main({
            "output_dir": str(ft_exp),
            "fs": 16000, "n_fft": 512, "hop_length": 128, "n_mels": 80,
            "generator_conf": {"channels": 128,
                               "upsample_scales": (8, 4, 4),
                               "upsample_kernel_sizes": (16, 8, 8),
                               "kernel_size": 7,
                               "resblock_kernel_sizes": (3, 7),
                               "resblock_dilations": ((1, 3), (1, 3))},
            "discriminator_conf": {"periods": (2, 3, 5), "scales": 2},
            "segment_size": 8192,
            "batch_size": 16, "max_epoch": args.vocoder_epochs // 2,
            "steps_per_dispatch": 8,
            "optim_conf": {"lr": 1e-4, "betas": (0.5, 0.9)},
            "optim2_conf": {"lr": 1e-4, "betas": (0.5, 0.9)},
            "keep_nbest_models": 2, "log_interval": 10,
            "resume": True,
            "init_param": str(next(voc_exp.glob("valid.loss.ave_*best"),
                                   voc_exp / "valid.loss.best")),
            "train_data_path_and_name_and_type": [
                f"{data}/train/wav.scp,speech,sound",
                f"{work}/tf_mels_train.scp,feats,npy"],
            "valid_data_path_and_name_and_type": [
                f"{data}/valid/wav.scp,speech,sound",
                f"{work}/tf_mels_valid.scp,feats,npy"],
        })

    if args.stage <= 7 <= args.stop_stage:
        print("=== stage 7: finetuned-vocoder TTS -> ASR loop ===",
              flush=True)
        import numpy as np

        from espnet_tpu.bin.asr_inference import Speech2Text
        from espnet_tpu.bin.tts_inference import Text2Speech
        from espnet_tpu.data.batching import bucket_length
        from espnet_tpu.data.fileio import read_2columns_text, write_wav
        from espnet_tpu.utils.native import score_corpus
        voc_ckpt = next(ft_exp.glob("valid.loss.ave_*best"),
                        ft_exp / "valid.loss.best")
        t2s = Text2Speech(
            train_config=exp / "config.yaml",
            model_file=next(exp.glob("valid.loss.ave_*best"),
                            exp / "valid.loss.best"),
            vocoder_file=voc_ckpt,
            vocoder_config=ft_exp / "config.yaml")
        asset = Path(args.asr_asset)
        s2t = Speech2Text(asr_train_config=asset / "config.yaml",
                          asr_model_file=asset, beam_size=10,
                          ctc_weight=0.3)
        texts = read_2columns_text(data / "valid" / "text")
        sid_file = data / "valid" / "utt2sid"
        sids = ({k: int(v) for k, v in read_2columns_text(
            sid_file).items()} if sid_file.exists() else {})
        keys = sorted(texts)[:args.n_eval]
        wavdir = work / "synth_wavs_vocoder_ft"
        wavdir.mkdir(parents=True, exist_ok=True)
        refs, hyps = [], []
        for k in keys:
            out = t2s(texts[k], sid=sids.get(k))
            wav = np.asarray(out["wav"], np.float32)
            write_wav(wavdir / f"{k}.wav", 16000, wav)
            Lb = bucket_length(max(len(wav), 4096), base=4096, growth=1.3)
            nb = s2t(np.pad(wav, (0, Lb - len(wav)))[None],
                     np.asarray([len(wav)], np.int32))
            hyps.append(nb[0][0][0])
            refs.append(texts[k])
        wer = score_corpus(refs, hyps, unit="word")
        cer = score_corpus(refs, hyps, unit="char")
        print(f"TTS->ASR (HiFiGAN finetuned) WER: "
              f"{wer['err_rate'] * 100:.2f}%  "
              f"CER: {cer['err_rate'] * 100:.2f}%  ({len(keys)} utts)")
        res = {}
        if (work / "RESULTS.json").exists():
            res = json.loads((work / "RESULTS.json").read_text())
        res.update({"tts_asr_wer_hifigan_ft": wer["err_rate"],
                    "tts_asr_cer_hifigan_ft": cer["err_rate"]})
        (work / "RESULTS.json").write_text(json.dumps(res))


if __name__ == "__main__":
    main()
