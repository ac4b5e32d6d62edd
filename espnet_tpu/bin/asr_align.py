"""CTC segmentation CLI (contract: espnet2/bin/asr_align.py — align
transcripts to audio, emit per-token/utterance time stamps)."""

from __future__ import annotations

import logging
import sys
from pathlib import Path

import numpy as np

from espnet_tpu.decode.ctc_segmentation import align_segments
from espnet_tpu.tasks.asr import ASRTask, read_token_list
from espnet_tpu.text.tokenizer import TokenIDConverter, build_tokenizer
from espnet_tpu.utils.config import parse_cli_overrides

logger = logging.getLogger(__name__)


class CTCSegmentation:
    def __init__(self, asr_train_config=None, asr_model_file=None):
        self.model, self.params, self.cfg = ASRTask.build_model_from_file(
            asr_train_config, asr_model_file)
        self.converter = TokenIDConverter(list(self.model.token_list))
        self.tokenizer = build_tokenizer(self.cfg.get("token_type", "char"))
        fc = self.cfg.get("frontend_conf") or {}
        self.fs = fc.get("fs", 16000)
        self.hop = fc.get("hop_length", 128)
        rate = {"conv2d": 4, "conv2d2": 2, "conv2d6": 6, "conv2d8": 8}.get(
            (self.cfg.get("encoder_conf") or {}).get("input_layer",
                                                     "conv2d"), 1)
        self.subsample = rate

    def __call__(self, speech: np.ndarray, text: str):
        """-> list of (token, start_sec, end_sec)."""
        toks = self.tokenizer.text2tokens(text)
        ids = self.converter.tokens2ids(toks)
        res = align_segments(
            self.model, self.params, speech[None],
            np.asarray([len(speech)], np.int32), [ids],
            np.asarray([len(ids)], np.int32), fs=self.fs,
            hop_length=self.hop, subsample=self.subsample)[0]
        return [(toks[i], s, e) for i, (_, s, e) in enumerate(res)]


def main(argv=None):
    args = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    from espnet_tpu.data.fileio import SoundScpReader, read_2columns_text
    out = Path(args.pop("output_dir"))
    wav_scp = args.pop("wav_scp")
    text_file = args.pop("text")
    seg = CTCSegmentation(asr_train_config=args.pop("asr_train_config"),
                          asr_model_file=args.pop("asr_model_file"))
    reader = SoundScpReader(wav_scp)
    texts = read_2columns_text(text_file)
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "segments", "w", encoding="utf-8") as f:
        for k in reader.keys():
            _, audio = reader[k]
            for tok, s, e in seg(audio, texts[k]):
                f.write(f"{k} {tok} {s:.3f} {e:.3f}\n")
    logger.info("alignments -> %s", out / "segments")


if __name__ == "__main__":
    main()
