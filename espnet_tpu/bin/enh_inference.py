"""SeparateSpeech API + batch enhancement CLI.

Behavioral contract: espnet2/bin/enh_inference.py:90-337 —
SeparateSpeech(train_config, model_file, segment_size, hop_size);
short inputs go through in one shot; long inputs are split into
overlapping segments, enhanced, and overlap-added back (:280-337) with
optional per-segment normalization.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.tasks.enh import EnhancementTask
from espnet_tpu.utils.config import parse_cli_overrides

logger = logging.getLogger(__name__)


class SeparateSpeech:
    def __init__(self, train_config=None, model_file=None,
                 segment_size: Optional[float] = None,
                 hop_size: Optional[float] = None,
                 normalize_segment_scale: bool = False,
                 normalize_output_wav: bool = False,
                 fs: int = 8000):
        self.model, self.params, self.cfg = \
            EnhancementTask.build_model_from_file(train_config, model_file)
        self.segment_size = segment_size
        self.hop_size = hop_size or (segment_size / 2 if segment_size else None)
        self.normalize_segment_scale = normalize_segment_scale
        self.normalize_output_wav = normalize_output_wav
        self.fs = fs
        self.num_spk = self.model.num_spk
        self._enh = jax.jit(lambda p, s, sl: self.model.apply(
            p, s, sl, method=self.model.forward_enhance))

    def _enhance(self, mix: np.ndarray, lengths) -> List[np.ndarray]:
        ests, _, _ = self._enh(self.params, jnp.asarray(mix),
                               jnp.asarray(lengths))
        return [np.asarray(e) for e in ests]

    def __call__(self, speech_mix: np.ndarray, fs: Optional[int] = None
                 ) -> List[np.ndarray]:
        """(S,) or (B, S) mixture -> list over speakers of (B, S)."""
        if speech_mix.ndim == 1:
            speech_mix = speech_mix[None]
        B, S = speech_mix.shape
        if self.segment_size is None or \
                S <= int(self.segment_size * self.fs):
            ests = self._enhance(speech_mix, np.full((B,), S, np.int32))
        else:
            seg = int(self.segment_size * self.fs)
            hop = int(self.hop_size * self.fs)
            out = [np.zeros((B, S), np.float64) for _ in range(self.num_spk)]
            norm = np.zeros((S,), np.float64)
            win = np.hanning(seg + 2)[1:-1] + 1e-6
            starts = list(range(0, max(S - seg, 0) + 1, hop))
            if starts[-1] + seg < S:
                starts.append(S - seg)
            prev_ests = None
            for st in starts:
                chunk = speech_mix[:, st:st + seg]
                if chunk.shape[1] < seg:
                    chunk = np.pad(chunk, ((0, 0), (0, seg - chunk.shape[1])))
                ests = self._enhance(chunk,
                                     np.full((B,), seg, np.int32))
                if self.normalize_segment_scale:
                    ests = [e / max(np.abs(e).max(), 1e-9)
                            * np.abs(chunk).max() for e in ests]
                # align speaker permutation to previous segment by overlap
                if prev_ests is not None and self.num_spk == 2:
                    ov = min(seg - hop, S - st)
                    a = np.sum(prev_ests[0][:, st:st + ov]
                               * ests[0][:, :ov])
                    b = np.sum(prev_ests[0][:, st:st + ov]
                               * ests[1][:, :ov])
                    if b > a:
                        ests = [ests[1], ests[0]]
                n = min(seg, S - st)
                for k in range(self.num_spk):
                    out[k][:, st:st + n] += ests[k][:, :n] * win[:n]
                norm[st:st + n] += win[:n]
                cur = [np.zeros((B, S)) for _ in range(self.num_spk)]
                for k in range(self.num_spk):
                    cur[k][:, st:st + n] = ests[k][:, :n]
                prev_ests = cur
            ests = [o / np.maximum(norm, 1e-10)[None, :] for o in out]
            ests = [e.astype(np.float32) for e in ests]
        if self.normalize_output_wav:
            ests = [e / max(np.abs(e).max(), 1e-9) * 0.9 for e in ests]
        return ests

    @staticmethod
    def from_pretrained(model_tag=None, **kwargs):
        if model_tag is not None:
            d = Path(model_tag)
            kwargs.setdefault("train_config", d / "config.yaml")
            kwargs.setdefault("model_file", d / "model")
        return SeparateSpeech(**kwargs)


def inference(output_dir, data_path_and_name_and_type, train_config,
              model_file, fs: int = 8000, **kw):
    from espnet_tpu.data.dataset import ESPnetDataset
    from espnet_tpu.data.fileio import SoundScpWriter
    from espnet_tpu.tasks.abs_task import parse_triples
    sep = SeparateSpeech(train_config=train_config, model_file=model_file,
                         fs=fs, **kw)
    ds = ESPnetDataset(parse_triples(data_path_and_name_and_type))
    out = Path(output_dir)
    writers = [SoundScpWriter(out / f"spk{k+1}", out / f"spk{k+1}.scp")
               for k in range(sep.num_spk)]
    for key in ds.keys():
        _, data = ds[key]
        ests = sep(data["speech_mix"])
        for k, w in enumerate(writers):
            w[key] = (fs, ests[k][0])
    for w in writers:
        w.close()
    logger.info("separated %d utterances -> %s", len(ds), out)


def main(argv=None):
    args = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    inference(**args)


if __name__ == "__main__":
    main()
