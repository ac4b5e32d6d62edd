"""Per-utterance numpy preprocessing.

Behavioral contract: espnet2/train/preprocessor.py:140
(CommonPreprocessor) — text cleaning + tokenization to int ids, optional
speech volume normalization and noise/RIR augmentation. The TPU framework
keeps heavy augmentation here on the host (numpy) and leaves on-device
augmentation (SpecAug) to the model graph.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import numpy as np

from espnet_tpu.text.tokenizer import TextCleaner, TokenIDConverter, build_tokenizer


def speed_perturb(speech: np.ndarray, factor: float) -> np.ndarray:
    """Resample by linear interpolation (sox speed-style tempo+pitch)."""
    n_out = max(int(round(len(speech) / factor)), 1)
    src = np.linspace(0.0, len(speech) - 1, n_out)
    i0 = np.floor(src).astype(np.int64)
    i1 = np.minimum(i0 + 1, len(speech) - 1)
    frac = (src - i0).astype(speech.dtype)
    return speech[i0] * (1 - frac) + speech[i1] * frac


class CommonPreprocessor:
    def __init__(self,
                 train: bool,
                 token_type: Optional[str] = None,
                 token_list=None,
                 bpemodel=None,
                 text_cleaner=None,
                 unk_symbol: str = "<unk>",
                 space_symbol: str = "<space>",
                 delimiter: Optional[str] = None,
                 g2p_type: Optional[str] = None,
                 non_linguistic_symbols: Iterable[str] = (),
                 speech_volume_normalize: Optional[float] = None,
                 noise_scp: Optional[str] = None,
                 noise_db_range: str = "13_15",
                 noise_apply_prob: float = 1.0,
                 rir_scp: Optional[str] = None,
                 rir_apply_prob: float = 1.0,
                 speed_perturb_factors: Optional[Iterable[float]] = None,
                 data_aug_effects: Optional[Iterable] = None,
                 data_aug_num: Iterable[int] = (1, 1),
                 data_aug_prob: float = 0.0,
                 speech_name: str = "speech",
                 text_name: str = "text",
                 text_names: Optional[Iterable[str]] = None,
                 rng_seed: int = 0):
        self.train = train
        self.speech_name = speech_name
        self.text_name = text_name
        # multi-text tokenization (CommonPreprocessor_multi / S2TPreprocessor
        # role: text + text_prev + text_ctc share one tokenizer)
        self.text_names = tuple(text_names) if text_names is not None \
            else (text_name,)
        self.speech_volume_normalize = speech_volume_normalize
        self.rng = np.random.RandomState(rng_seed)
        self.noise_apply_prob = noise_apply_prob
        self.rir_apply_prob = rir_apply_prob
        self.speed_perturb_factors = (list(speed_perturb_factors)
                                      if speed_perturb_factors else None)
        # effect-bank augmentation (espnet2/layers/augmentation.py role)
        self.data_aug = None
        self.data_aug_prob = data_aug_prob
        if data_aug_effects and data_aug_prob > 0.0:
            from espnet_tpu.data.augmentation import DataAugmentation
            self.data_aug = DataAugmentation(list(data_aug_effects),
                                             apply_n=tuple(data_aug_num),
                                             seed=rng_seed)
        lo, hi = (noise_db_range.split("_") + ["15"])[:2] \
            if "_" in noise_db_range else (noise_db_range, noise_db_range)
        self.noise_db_low, self.noise_db_high = float(lo), float(hi)
        self.noises = None
        self.rirs = None
        if noise_scp is not None:
            from espnet_tpu.data.fileio import SoundScpReader
            self.noises = SoundScpReader(noise_scp)
        if rir_scp is not None:
            from espnet_tpu.data.fileio import SoundScpReader
            self.rirs = SoundScpReader(rir_scp)
        if token_type is not None:
            if token_list is None:
                raise ValueError("token_list required with token_type")
            self.tokenizer = build_tokenizer(
                token_type, bpemodel=bpemodel, delimiter=delimiter,
                space_symbol=space_symbol, g2p_type=g2p_type,
                non_linguistic_symbols=non_linguistic_symbols)
            self.token_id_converter = TokenIDConverter(token_list, unk_symbol)
        else:
            self.tokenizer = None
            self.token_id_converter = None
        self.text_cleaner = TextCleaner(text_cleaner)

    def _augment(self, speech: np.ndarray) -> np.ndarray:
        """RIR convolution + noise mixing at a random SNR + speed +
        effect bank (preprocessor.py:156-161 behavior)."""
        if self.data_aug is not None \
                and self.rng.rand() < self.data_aug_prob:
            speech = self.data_aug(speech)
        if self.speed_perturb_factors:
            f = self.speed_perturb_factors[
                self.rng.randint(len(self.speed_perturb_factors))]
            if f != 1.0:
                speech = speed_perturb(speech, f)
        if self.rirs is not None and self.rng.rand() < self.rir_apply_prob:
            keys = list(self.rirs.keys())
            _, rir = self.rirs[keys[self.rng.randint(len(keys))]]
            if rir.ndim > 1:
                rir = rir[:, 0]
            power = np.mean(speech ** 2)
            speech = np.convolve(speech, rir, mode="full")[:len(speech)]
            p2 = np.mean(speech ** 2)
            if p2 > 0:
                speech = speech * np.sqrt(power / p2)
        if self.noises is not None and self.rng.rand() < self.noise_apply_prob:
            keys = list(self.noises.keys())
            _, noise = self.noises[keys[self.rng.randint(len(keys))]]
            if noise.ndim > 1:
                noise = noise[:, 0]
            if len(noise) < len(speech):
                reps = len(speech) // len(noise) + 1
                noise = np.tile(noise, reps)
            off = self.rng.randint(0, len(noise) - len(speech) + 1)
            noise = noise[off:off + len(speech)]
            snr = self.rng.uniform(self.noise_db_low, self.noise_db_high)
            sp = np.mean(speech ** 2) + 1e-12
            npow = np.mean(noise ** 2) + 1e-12
            scale = np.sqrt(sp / (npow * 10 ** (snr / 10.0)))
            speech = speech + scale * noise
        return speech.astype(np.float32)

    def __call__(self, uid: str, data: Dict) -> Dict[str, np.ndarray]:
        data = dict(data)
        if self.speech_name in data:
            speech = np.asarray(data[self.speech_name], dtype=np.float32)
            if self.train:
                speech = self._augment(speech)
            if self.speech_volume_normalize is not None:
                ma = np.abs(speech).max()
                if ma > 0:
                    speech = speech * (self.speech_volume_normalize / ma)
            data[self.speech_name] = speech
        if self.tokenizer is not None:
            for name in self.text_names:
                text = data.get(name)
                if isinstance(text, str):
                    text = self.text_cleaner(text)
                    tokens = self.tokenizer.text2tokens(text)
                    ids = self.token_id_converter.tokens2ids(tokens)
                    data[name] = np.asarray(ids, dtype=np.int32)
        return data


class DynamicMixingPreprocessor:
    """On-the-fly mixture creation (espnet2/train/preprocessor.py:915
    DynamicMixingPreprocessor): each utterance's clean source is mixed
    with num_spk-1 randomly drawn other sources at a random LUFS-ish
    gain, producing speech_mix + speech_ref{n}. Epoch-deterministic via
    (seed, utt-id) hashing so multi-worker loading stays reproducible."""

    def __init__(self, source_scp: str, num_spk: int = 2,
                 mixture_source_name: str = "speech_ref1",
                 dynamic_mixing_gain_db: float = 2.5,
                 rng_seed: int = 0):
        from espnet_tpu.data.fileio import SoundScpReader
        self.reader = SoundScpReader(source_scp)
        self.keys = list(self.reader.keys())
        self.num_spk = num_spk
        self.source_name = mixture_source_name
        self.gain_db = dynamic_mixing_gain_db
        self.seed = rng_seed

    def __call__(self, uid: str, data: dict) -> dict:
        import hashlib
        h = hashlib.md5(f"{self.seed}:{uid}".encode()).digest()
        rng = np.random.RandomState(np.frombuffer(h[:4], np.uint32)[0])
        ref1 = np.asarray(data.get(self.source_name,
                                   data.get("speech")), np.float32)
        refs = [ref1]
        L = len(ref1)
        for _ in range(self.num_spk - 1):
            k = self.keys[rng.randint(len(self.keys))]
            _, other = self.reader[k]
            other = np.asarray(other, np.float32)
            if len(other) >= L:
                s = rng.randint(0, len(other) - L + 1)
                other = other[s:s + L]
            else:
                other = np.pad(other, (0, L - len(other)))
            gain_db = rng.uniform(-self.gain_db, self.gain_db)
            p_ref = np.sqrt(np.mean(ref1 ** 2) + 1e-8)
            p_oth = np.sqrt(np.mean(other ** 2) + 1e-8)
            other = other * (p_ref / p_oth) * (10 ** (gain_db / 20))
            refs.append(other)
        out = {"speech_mix": np.sum(refs, axis=0).astype(np.float32)}
        for i, r in enumerate(refs, 1):
            out[f"speech_ref{i}"] = r.astype(np.float32)
        return out
