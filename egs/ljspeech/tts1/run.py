#!/usr/bin/env python3
"""LJSpeech-style TTS recipe skeleton (BASELINE configs[4]).

Mirrors egs2/ljspeech/tts1 stage flow with the in-env synthetic corpus
standing in for LJSpeech (no downloadable data offline): raw text is
phonemized with the built-in rule-based English g2p (`g2p: english_rule`,
token_type phn — espnet2/text/phoneme_tokenizer.py contract),
FastSpeech2 trains on phoneme ids, HiFiGAN trains as the vocoder, and
Text2Speech synthesizes waveforms from raw text end-to-end.

Swap stage 1 for real LJSpeech data prep (wav.scp/text) when data is
available — later stages are corpus-agnostic.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
ROOT = HERE.parents[2]
sys.path.insert(0, str(ROOT))

PHONES = [
    "AA0", "AA1", "AE0", "AE1", "AH0", "AH1", "AO0", "AO1", "AW0", "AW1",
    "AY0", "AY1", "B", "CH", "D", "DH", "EH0", "EH1", "ER0", "ER1", "EY0",
    "EY1", "F", "G", "HH", "IH0", "IH1", "IY0", "IY1", "JH", "K", "L", "M",
    "N", "NG", "OW0", "OW1", "OY0", "OY1", "P", "R", "S", "SH", "T", "TH",
    "UH0", "UH1", "UW0", "UW1", "V", "W", "Y", "Z", "ZH",
]


def token_list():
    return ["<blank>", "<unk>"] + PHONES + ["<space>", "<sos/eos>"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=1)
    ap.add_argument("--stop_stage", type=int, default=4)
    ap.add_argument("--workdir", default=str(HERE / "work"))
    ap.add_argument("--n_train", type=int, default=32)
    ap.add_argument("--max_epoch", type=int, default=4)
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    args = ap.parse_args()
    work = Path(args.workdir)

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    data = work / "data"
    exp = work / "exp" / "tts_fastspeech2"

    cfg = {
        "token_list": str(data / "tokens.txt"),
        "token_type": "phn",
        "g2p": "english_rule",
        "feats_extract": "fbank",
        "feats_extract_conf": {"fs": 16000, "n_fft": 512, "hop_length": 128,
                               "n_mels": 40},
        "tts": "fastspeech2",
        "tts_conf": {"adim": 32, "aheads": 2, "elayers": 1, "dlayers": 1,
                     "eunits": 48, "dunits": 48},
        "optim_conf": {"lr": 0.01},
        "batch_type": "unsorted", "batch_size": 8,
        "max_epoch": args.max_epoch,
        "train_data_path_and_name_and_type": [
            f"{data}/train/wav.scp,speech,sound",
            f"{data}/train/text,text,text"],
        "valid_data_path_and_name_and_type": [
            f"{data}/valid/wav.scp,speech,sound",
            f"{data}/valid/text,text,text"],
    }

    if args.stage <= 1 <= args.stop_stage:
        print("=== stage 1: data preparation (synthetic LJ stand-in) ===")
        from espnet_tpu.data.synth_speech import SynthSpeechCorpus
        SynthSpeechCorpus(n_words=40).materialize(
            data, n_train=args.n_train, n_valid=4, n_test=0)
        (data / "tokens.txt").write_text("\n".join(token_list()) + "\n")

    if args.stage <= 2 <= args.stop_stage:
        print("=== stage 2: train FastSpeech2 on g2p phonemes ===")
        from espnet_tpu.tasks.tts import TTSTask
        TTSTask.main(dict(cfg, output_dir=str(exp)))

    if args.stage <= 3 <= args.stop_stage:
        print("=== stage 3: train HiFiGAN vocoder ===")
        from espnet_tpu.tasks.gan_tts import GANVocoderTask
        GANVocoderTask.main({
            "output_dir": str(work / "exp" / "hifigan"),
            "fs": 16000, "n_fft": 512, "hop_length": 128, "n_mels": 40,
            "generator_conf": {"channels": 32, "upsample_scales": (8, 4, 4),
                               "kernel_size": 7},
            "batch_type": "unsorted", "batch_size": 2, "max_epoch": 1,
            "batch_bins": 100000,
            "train_data_path_and_name_and_type": [
                f"{data}/train/wav.scp,speech,sound"],
            "valid_data_path_and_name_and_type": [
                f"{data}/valid/wav.scp,speech,sound"],
        })

    if args.stage <= 4 <= args.stop_stage:
        print("=== stage 4: Text2Speech from raw text via g2p ===")
        import numpy as np

        from espnet_tpu.bin.tts_inference import Text2Speech
        from espnet_tpu.data.fileio import write_wav
        t2s = Text2Speech(train_config=exp / "config.yaml",
                          model_file=next(exp.glob("valid.loss.ave_*best"),
                                          exp / "valid.loss.best"))
        out = t2s("the quick brown fox jumps over the lazy dog")
        wav = np.asarray(out["wav"])
        write_wav(work / "synthesized.wav", 16000, wav)
        print(f"synthesized {len(wav) / 16000:.2f}s -> "
              f"{work / 'synthesized.wav'}")


if __name__ == "__main__":
    main()
