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
                 non_linguistic_symbols: Iterable[str] = (),
                 speech_volume_normalize: Optional[float] = None,
                 speech_name: str = "speech",
                 text_name: str = "text",
                 rng_seed: int = 0):
        self.train = train
        self.speech_name = speech_name
        self.text_name = text_name
        self.speech_volume_normalize = speech_volume_normalize
        self.rng = np.random.RandomState(rng_seed)
        if token_type is not None:
            if token_list is None:
                raise ValueError("token_list required with token_type")
            self.tokenizer = build_tokenizer(
                token_type, bpemodel=bpemodel, delimiter=delimiter,
                space_symbol=space_symbol,
                non_linguistic_symbols=non_linguistic_symbols)
            self.token_id_converter = TokenIDConverter(token_list, unk_symbol)
        else:
            self.tokenizer = None
            self.token_id_converter = None
        self.text_cleaner = TextCleaner(text_cleaner)

    def __call__(self, uid: str, data: Dict) -> Dict[str, np.ndarray]:
        data = dict(data)
        if self.speech_name in data:
            speech = np.asarray(data[self.speech_name], dtype=np.float32)
            if self.speech_volume_normalize is not None:
                ma = np.abs(speech).max()
                if ma > 0:
                    speech = speech * (self.speech_volume_normalize / ma)
            data[self.speech_name] = speech
        if self.text_name in data and self.tokenizer is not None:
            text = data[self.text_name]
            if isinstance(text, str):
                text = self.text_cleaner(text)
                tokens = self.tokenizer.text2tokens(text)
                ids = self.token_id_converter.tokens2ids(tokens)
                data[self.text_name] = np.asarray(ids, dtype=np.int32)
        return data
