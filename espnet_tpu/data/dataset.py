"""Dataset keyed by utterance id with a loader-type registry.

Behavioral contract: espnet2/train/dataset.py — `ESPnetDataset` takes
repeatable triples (path, name, type) from `DATA_TYPES` (:252) and
returns `(utt_id, {name: np.ndarray})`; the preprocessor is applied
per-utterance on numpy (espnet2/train/preprocessor.py).

The host-side pipeline is numpy-only (no torch DataLoader). Batching and
device transfer live in the iterator (data/iterator.py) which feeds the
jitted step with double-buffered device_put.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np

from espnet_tpu.data.fileio import (NpyScpReader, SoundScpReader,
                                    load_num_sequence_text,
                                    read_2columns_text)


class _SoundLoader:
    def __init__(self, path):
        self.reader = SoundScpReader(path)

    def __getitem__(self, key):
        rate, arr = self.reader[key]
        if arr.ndim == 2 and arr.shape[1] == 1:
            arr = arr[:, 0]
        return arr

    def keys(self):
        return self.reader.keys()

    def __len__(self):
        return len(self.reader)


class _TextLoader:
    def __init__(self, path):
        self.data = read_2columns_text(path)

    def __getitem__(self, key):
        return self.data[key]

    def keys(self):
        return self.data.keys()

    def __len__(self):
        return len(self.data)


class _NumLoader:
    def __init__(self, path, loader_type):
        self.data = load_num_sequence_text(path, loader_type)

    def __getitem__(self, key):
        return self.data[key]

    def keys(self):
        return self.data.keys()

    def __len__(self):
        return len(self.data)


def _score_loader(path):
    from espnet_tpu.data.score_io import SingingScoreReader
    return SingingScoreReader(path)


DATA_TYPES: Dict[str, Callable] = {
    "sound": _SoundLoader,
    "npy": NpyScpReader,
    "text": _TextLoader,
    "text_int": lambda p: _NumLoader(p, "text_int"),
    "text_float": lambda p: _NumLoader(p, "text_float"),
    "csv_int": lambda p: _NumLoader(p, "csv_int"),
    "csv_float": lambda p: _NumLoader(p, "csv_float"),
    "score": _score_loader,  # singing score (score_scp.py contract)
    "kaldi_ark": None,  # filled below (pure-Python kaldi ark)
    "hdf5": None,
    "multi_columns_sound": None,
    "rttm": None,
}


def _register_extra_types():
    from espnet_tpu.data.fileio import (Hdf5Reader, MultiColumnSoundReader,
                                        RttmReader)
    from espnet_tpu.data.kaldi_ark import KaldiScpReader
    DATA_TYPES["kaldi_ark"] = KaldiScpReader
    DATA_TYPES["hdf5"] = Hdf5Reader
    DATA_TYPES["rttm"] = RttmReader

    class _MultiSound:
        def __init__(self, path):
            self.r = MultiColumnSoundReader(path)

        def __getitem__(self, k):
            return self.r[k][1]

        def keys(self):
            return self.r.keys()

        def __len__(self):
            return len(self.r)

    DATA_TYPES["multi_columns_sound"] = _MultiSound


_register_extra_types()


def build_loader(path: str, typ: str):
    """One loader from the registry (speechlm JSON data_entry hook)."""
    if typ not in DATA_TYPES:
        raise ValueError(
            f"unknown data type {typ!r}; available: {list(DATA_TYPES)}")
    return DATA_TYPES[typ](path)


class ESPnetDataset:
    """dict-style dataset: self[utt_id] -> {name: array-or-str} then
    preprocess(uid, data) -> {name: np.ndarray}."""

    def __init__(self,
                 path_name_type_list: Sequence[Tuple[str, str, str]],
                 preprocess: Optional[Callable[[str, dict], dict]] = None):
        if len(path_name_type_list) == 0:
            raise ValueError("path_name_type_list must not be empty")
        self.loaders = {}
        for path, name, typ in path_name_type_list:
            if typ not in DATA_TYPES:
                raise ValueError(
                    f"unknown data type {typ!r}; available: {list(DATA_TYPES)}")
            if name in self.loaders:
                raise RuntimeError(f"duplicate data name {name!r}")
            self.loaders[name] = DATA_TYPES[typ](path)
        self.preprocess = preprocess

    def names(self):
        return list(self.loaders.keys())

    def keys(self):
        first = next(iter(self.loaders.values()))
        return list(first.keys())

    def __len__(self):
        return len(next(iter(self.loaders.values())))

    def __getitem__(self, uid: str) -> Tuple[str, Dict[str, np.ndarray]]:
        data = {name: loader[uid] for name, loader in self.loaders.items()}
        if self.preprocess is not None:
            data = self.preprocess(uid, data)
        for name, v in data.items():
            if isinstance(v, np.ndarray) and v.dtype.kind == "f":
                data[name] = v.astype(np.float32)
            elif isinstance(v, np.ndarray) and v.dtype.kind == "i":
                data[name] = v.astype(np.int32)
        return uid, data
