"""S2ST inference CLI (contract: espnet2/bin/s2st_inference.py
Speech2Speech — source speech in, translated speech out; the
discrete-unit family decodes units then synthesizes through the codec,
the translatotron family emits spectra vocoded by griffin-lim or a
neural vocoder)."""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.tasks.s2st import S2STTask


class Speech2SpeechInference:
    """Config-driven wrapper over the two S2ST families."""

    def __init__(self, train_config=None, model_file=None,
                 codec_train_config=None, codec_model_file=None,
                 beam_size: int = 5, maxlenratio: float = 0.5,
                 griffin_lim_iters: int = 32, max_frames: int = 512):
        self.model, self.params, self.cfg = S2STTask.build_model_from_file(
            train_config, model_file)
        self.s2st_type = self.cfg.get("s2st_type", "discrete_unit")
        self.max_frames = max_frames
        self.griffin_lim_iters = griffin_lim_iters
        if self.s2st_type == "discrete_unit":
            from espnet_tpu.models.s2st import Speech2Speech
            from espnet_tpu.tasks.ssl import CodecTask
            if codec_train_config is None:
                raise ValueError("discrete_unit S2ST needs a codec "
                                 "(codec_train_config/codec_model_file)")
            codec, codec_params, _ = CodecTask.build_model_from_file(
                codec_train_config, codec_model_file)
            self.pipeline = Speech2Speech(
                self.model, self.params, codec, codec_params,
                beam_size=beam_size, maxlenratio=maxlenratio)
        else:
            self.pipeline = None

    def __call__(self, speech: np.ndarray, speech_lengths=None):
        """-> list of (S,) float32 translated waveforms."""
        if self.pipeline is not None:
            return self.pipeline(speech, speech_lengths)
        # spectral family: inference -> log-mel -> griffin-lim
        from espnet_tpu.ops.griffin_lim import griffin_lim, logmel_to_linear
        if speech.ndim == 1:
            speech = speech[None]
        B = speech.shape[0]
        if speech_lengths is None:
            speech_lengths = np.full((B,), speech.shape[1], np.int32)
        mel, olens = self.model.apply(
            self.params, jnp.asarray(speech), jnp.asarray(speech_lengths),
            max_frames=self.max_frames, method=self.model.inference)
        fc = self.cfg.get("frontend_conf") or {}
        n_fft = fc.get("n_fft", 512)
        hop = fc.get("hop_length", 128)
        fs = fc.get("fs", 16000)
        wavs = []
        for b in range(B):
            # griffin-lim needs enough frames that the centered istft
            # keeps >=1 sample: T > n_fft/hop
            n = max(int(np.asarray(olens)[b]), n_fft // hop + 1)
            m = jnp.asarray(np.asarray(mel[b][:n])[None])
            lin = logmel_to_linear(m, fs=fs, n_fft=n_fft,
                                   n_mels=m.shape[-1])
            wavs.append(np.asarray(griffin_lim(
                lin, n_fft=n_fft, hop_length=hop,
                n_iter=self.griffin_lim_iters)[0]))
        return wavs


def inference(output_dir, wav_scp, **kw):
    from espnet_tpu.data.fileio import SoundScpReader, write_wav
    out = Path(output_dir)
    (out / "wav").mkdir(parents=True, exist_ok=True)
    s2s = Speech2SpeechInference(**kw)
    reader = SoundScpReader(wav_scp)
    fs = (s2s.cfg.get("frontend_conf") or {}).get("fs", 16000)
    for k in reader.keys():
        _, wav = reader[k]
        ws = s2s(np.asarray(wav, np.float32))
        write_wav(out / "wav" / f"{k}.wav", fs, ws[0])


def main(argv=None):
    from espnet_tpu.utils.config import parse_cli_overrides
    kw = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    inference(**kw)


if __name__ == "__main__":
    main()
