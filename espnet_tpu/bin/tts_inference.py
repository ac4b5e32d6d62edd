"""Text2Speech API + batch synthesis CLI.

Behavioral contract: espnet2/bin/tts_inference.py:34-218 — Text2Speech
(train_config, model_file, vocoder_config/file) -> __call__(text) dict
with wav/feat_gen; vocoder applied to generated features (:204-213),
griffin-lim fallback (utils/griffin_lim.py).
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.ops.griffin_lim import griffin_lim, logmel_to_linear
from espnet_tpu.tasks.tts import TTSTask
from espnet_tpu.utils.config import parse_cli_overrides

logger = logging.getLogger(__name__)


class Text2Speech:
    def __init__(self, train_config=None, model_file=None,
                 vocoder_config=None, vocoder_file=None, speed: float = 1.0,
                 griffin_lim_iters: int = 32, noise_scale: float = 0.667):
        from espnet_tpu.utils.config import load_yaml

        # GAN-TTS (VITS/JETS) configs decode text -> waveform directly
        # (espnet2 tts_inference.py:196 use_vocoder routing): detect by
        # the two-optimizer config shape and skip the vocoder path.
        cfg_probe = load_yaml(train_config) if train_config else {}
        self.is_e2e = "discriminator_conf" in cfg_probe and \
            "feats_extract_conf" not in cfg_probe
        if self.is_e2e:
            from espnet_tpu.tasks.gan_tts import GANTTSTask
            self.model, self.params, self.cfg = \
                GANTTSTask.build_model_from_file(train_config, model_file)
            self.preprocess = GANTTSTask.build_preprocess_fn(
                self.cfg, train=False)
        else:
            self.model, self.params, self.cfg = \
                TTSTask.build_model_from_file(train_config, model_file)
            self.preprocess = TTSTask.build_preprocess_fn(
                self.cfg, train=False)
        self.speed = speed
        self.noise_scale = noise_scale
        self.griffin_lim_iters = griffin_lim_iters
        fc = self.cfg.get("feats_extract_conf") or self.cfg
        self.fs = fc.get("fs", 22050)
        self.n_fft = fc.get("n_fft", 1024)
        self.hop_length = fc.get("hop_length", 256)
        self.n_mels = fc.get("n_mels", 80)
        self.vocoder = None
        self.vocoder_params = None
        if vocoder_file is not None:
            from espnet_tpu.models.tts.gan_vocoder import HiFiGANVocoderGAN
            from espnet_tpu.train.checkpoint import load_checkpoint
            from espnet_tpu.utils.config import load_yaml
            vcfg = load_yaml(vocoder_config) if vocoder_config else {}
            gen = vcfg.get("generator", "hifigan")
            if gen == "wavenet":
                # AR mu-law WaveNet vocoder (gan_tts/wavenet role): no
                # discriminator; decode = one on-device generation scan
                from espnet_tpu.models.tts.wavenet import WaveNetVocoder
                wn = WaveNetVocoder(aux_channels=self.n_mels,
                                    hop_length=self.hop_length,
                                    **dict(vcfg.get("generator_conf") or {}))

                class _WaveNetAdapter:
                    def decode(self, params, mel):
                        return wn.apply(params, mel, method=wn.generate)

                self.vocoder = _WaveNetAdapter()
            else:
                self.vocoder = HiFiGANVocoderGAN(
                    fs=self.fs, n_fft=self.n_fft,
                    hop_length=self.hop_length, n_mels=self.n_mels,
                    generator=gen,
                    generator_conf=vcfg.get("generator_conf"),
                    discriminator_conf=vcfg.get("discriminator_conf"))
            self.vocoder_params, _, _ = load_checkpoint(vocoder_file)

    def __call__(self, text, out_len: int = 512, sid=None):
        """text: str or pre-tokenized int array -> dict(wav, feat_gen).

        Text is padded to a bucketed length and the inference apply is
        jitted per bucket (cached) — corpus synthesis costs a handful of
        compiles instead of one per distinct text length."""
        from espnet_tpu.data.batching import bucket_length
        if isinstance(text, str):
            data = self.preprocess("<inference>", {
                "text": text, "speech": np.zeros((2048,), np.float32)}
                if self.is_e2e else {"text": text})
            ids = data["text"]
        else:
            ids = np.asarray(text, np.int32)
        L = len(ids)
        Lb = bucket_length(max(L, 1), base=8, growth=1.3)
        ids_in = jnp.asarray(np.pad(ids, (0, Lb - L))[None])
        lens = jnp.asarray([L], jnp.int32)
        if self.is_e2e:
            ekey = ("e2e", Lb, out_len)
            if not hasattr(self, "_infer_cache"):
                self._infer_cache = {}
            if ekey not in self._infer_cache:
                self._infer_cache[ekey] = jax.jit(
                    lambda p, t, tl, r: self.model.decode(
                        p, t, tl, rng=r, max_frames=out_len,
                        noise_scale=self.noise_scale, speed=self.speed))
            wav, olens = self._infer_cache[ekey](
                self.params, ids_in, lens, jax.random.PRNGKey(0))
            T = max(int(olens[0]), 1)
            wav = np.asarray(wav, np.float32)[0, :T * self.hop_length]
            return {"wav": wav, "feat_gen": None}
        key = (Lb, out_len, sid is not None)
        if not hasattr(self, "_infer_cache"):
            self._infer_cache = {}
        if key not in self._infer_cache:
            if sid is not None:
                self._infer_cache[key] = jax.jit(
                    lambda p, t, tl, s: self.model.apply(
                        p, t, tl, out_len=out_len, sids=s,
                        method=self.model.inference))
            else:
                self._infer_cache[key] = jax.jit(
                    lambda p, t, tl: self.model.apply(
                        p, t, tl, out_len=out_len,
                        method=self.model.inference))
        if sid is not None:
            mel, olens = self._infer_cache[key](
                self.params, ids_in, lens,
                jnp.asarray([int(sid)], jnp.int32))
        else:
            mel, olens = self._infer_cache[key](self.params, ids_in, lens)
        # clamp to >=2 frames: a model may predict all-zero durations for
        # degenerate inputs and downstream STFT needs a non-empty signal
        T = max(int(olens[0]), 2)
        # vocode on a bucketed frame count with a cached jitted program
        # (griffin-lim is 32 STFT/iSTFT rounds — eager dispatch would pay
        # hundreds of per-op round trips per utterance)
        from espnet_tpu.data.batching import bucket_length
        Tb = bucket_length(T, base=64, growth=1.3)
        mel_np = np.asarray(mel[0])
        pad_val = float(mel_np.min())
        mel_pad = np.full((1, Tb, mel_np.shape[-1]), pad_val, np.float32)
        mel_pad[0, :T] = mel_np[:T]
        vkey = ("voc", Tb)
        if vkey not in self._infer_cache:
            if self.vocoder is not None:
                self._infer_cache[vkey] = jax.jit(
                    lambda vp, m: self.vocoder.decode(vp, m))
            else:
                self._infer_cache[vkey] = jax.jit(
                    lambda vp, m: griffin_lim(
                        logmel_to_linear(m, fs=self.fs, n_fft=self.n_fft,
                                         n_mels=self.n_mels),
                        n_fft=self.n_fft, hop_length=self.hop_length,
                        n_iter=self.griffin_lim_iters))
        wav = self._infer_cache[vkey](self.vocoder_params,
                                      jnp.asarray(mel_pad))[0]
        wav = np.asarray(wav)[:T * self.hop_length]
        return {"wav": wav, "feat_gen": mel_np[:T]}

    @staticmethod
    def from_pretrained(model_tag=None, **kwargs):
        if model_tag is not None:
            d = Path(model_tag)
            kwargs.setdefault("train_config", d / "config.yaml")
            kwargs.setdefault("model_file", d / "model")
        return Text2Speech(**kwargs)


def inference(output_dir, data_path_and_name_and_type, train_config,
              model_file, vocoder_config=None, vocoder_file=None, **kw):
    """Batch synthesis -> wav dir + scp (tts_inference.py writer)."""
    from espnet_tpu.data.dataset import ESPnetDataset
    from espnet_tpu.data.fileio import SoundScpWriter
    from espnet_tpu.tasks.abs_task import parse_triples
    t2s = Text2Speech(train_config=train_config, model_file=model_file,
                      vocoder_config=vocoder_config,
                      vocoder_file=vocoder_file, **kw)
    # raw text rows; Text2Speech tokenizes internally (handles both the
    # mel-TTS and the GAN-TTS preprocess contracts)
    ds = ESPnetDataset(parse_triples(data_path_and_name_and_type))
    out = Path(output_dir)
    with SoundScpWriter(out / "wav", out / "wav.scp") as w:
        for k in ds.keys():
            _, data = ds[k]
            r = t2s(data["text"])
            w[k] = (t2s.fs, r["wav"])
    logger.info("synthesized %d utterances -> %s", len(ds), out)


def main(argv=None):
    args = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    inference(**args)


if __name__ == "__main__":
    main()
