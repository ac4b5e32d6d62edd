"""SingingGenerate API + batch synthesis CLI.

Behavioral contract: espnet2/bin/svs_inference.py — `SingingGenerate`
built from (train_config, model_file); `__call__(score)` accepts a
score dict (score_scp.py format) or a MusicXML path and returns
dict(wav, feat_gen). Griffin-lim vocodes the mel unless a trained
HiFiGAN vocoder is given (same contract as Text2Speech).
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.ops.griffin_lim import griffin_lim, logmel_to_linear
from espnet_tpu.tasks.svs import SVSTask
from espnet_tpu.utils.config import parse_cli_overrides

logger = logging.getLogger(__name__)


class SingingGenerate:
    def __init__(self, train_config=None, model_file=None,
                 vocoder_config=None, vocoder_file=None,
                 griffin_lim_iters: int = 32):
        self.model, self.params, self.cfg = SVSTask.build_model_from_file(
            train_config, model_file)
        self.preprocess = SVSTask.build_preprocess_fn(self.cfg, train=False)
        fc = self.cfg.get("feats_extract_conf") or {}
        self.fs = fc.get("fs", 16000)
        self.n_fft = fc.get("n_fft", 512)
        self.hop_length = fc.get("hop_length", 128)
        self.n_mels = fc.get("n_mels", 80)
        self.griffin_lim_iters = griffin_lim_iters
        self.vocoder = None
        if vocoder_file is not None:
            from espnet_tpu.models.tts.gan_vocoder import HiFiGANVocoderGAN
            from espnet_tpu.train.checkpoint import load_checkpoint
            from espnet_tpu.utils.config import load_yaml
            vcfg = load_yaml(vocoder_config) if vocoder_config else {}
            self.vocoder = HiFiGANVocoderGAN(
                fs=self.fs, n_fft=self.n_fft, hop_length=self.hop_length,
                n_mels=self.n_mels,
                generator_conf=vcfg.get("generator_conf"),
                discriminator_conf=vcfg.get("discriminator_conf"))
            self.vocoder_params, _, _ = load_checkpoint(vocoder_file)

    def __call__(self, score) -> dict:
        """score: dict (score_scp format) or MusicXML path."""
        if isinstance(score, (str, Path)):
            from espnet_tpu.data.score_io import read_musicxml
            score = read_musicxml(score)
        data = self.preprocess("<inference>", {"score": score})
        text = jnp.asarray(data["text"][None])
        tl = jnp.asarray([text.shape[1]], jnp.int32)
        midi = jnp.asarray(data["midi"][None])
        durs = jnp.asarray(data["durations"][None])
        total = int(np.sum(data["durations"])) + 8
        mel, olens = self.model.apply(self.params, text, tl, midi, durs,
                                      out_len=total,
                                      method=self.model.inference)
        T = max(int(olens[0]), 2)
        mel_valid = mel[:, :T]
        if self.vocoder is not None:
            wav = self.vocoder.decode(self.vocoder_params, mel_valid)[0]
        else:
            lin = logmel_to_linear(mel_valid, fs=self.fs, n_fft=self.n_fft,
                                   n_mels=self.n_mels)
            wav = griffin_lim(lin, n_fft=self.n_fft,
                              hop_length=self.hop_length,
                              n_iter=self.griffin_lim_iters)[0]
        return {"wav": np.asarray(wav), "feat_gen": np.asarray(mel_valid[0])}


def inference(output_dir, score_scp, train_config, model_file, **kw):
    from espnet_tpu.data.fileio import write_wav
    from espnet_tpu.data.score_io import SingingScoreReader
    gen = SingingGenerate(train_config=train_config, model_file=model_file,
                          **kw)
    reader = SingingScoreReader(score_scp)
    out = Path(output_dir)
    (out / "wav").mkdir(parents=True, exist_ok=True)
    with open(out / "wav.scp", "w") as fw:
        for k in reader.keys():
            r = gen(reader[k])
            write_wav(out / "wav" / f"{k}.wav", gen.fs, r["wav"])
            fw.write(f"{k} {out / 'wav' / f'{k}.wav'}\n")
    logger.info("synthesized %d scores -> %s", len(reader), output_dir)


def main(argv=None):
    args = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    inference(**args)


if __name__ == "__main__":
    main()
