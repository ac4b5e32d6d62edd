"""Kaldi-style file IO: scp maps, wav read/write, npy scp, DatadirWriter.

Behavioral contract: espnet2/fileio/ — `read_2columns_text`
(read_text.py), `SoundScpReader`/`SoundScpWriter` (sound_scp.py:81),
`NpyScpReader`, `DatadirWriter` (datadir_writer.py:8).

WAV IO is implemented with the stdlib `wave` module + numpy (PCM16/32,
float32 via WAVE_FORMAT_IEEE_FLOAT not supported by `wave`, so we parse
the RIFF header directly for float files). soundfile is used when
importable.
"""

from __future__ import annotations

import struct
import wave
from pathlib import Path
from typing import Dict, Tuple, Union

import numpy as np

try:  # optional fast path
    import soundfile as _sf
except ImportError:  # pragma: no cover
    _sf = None


def read_2columns_text(path: Union[Path, str]) -> Dict[str, str]:
    """'key value...' per line -> dict (espnet2/fileio/read_text.py)."""
    d = {}
    with open(path, encoding="utf-8") as f:
        for ln, line in enumerate(f, 1):
            sps = line.rstrip("\n").split(maxsplit=1)
            if len(sps) == 1:
                k, v = sps[0], ""
            elif len(sps) == 0:
                continue
            else:
                k, v = sps
            if k in d:
                raise RuntimeError(f"duplicate key {k!r} at {path}:{ln}")
            d[k] = v
    return d


def load_num_sequence_text(path, loader_type: str = "text_int"):
    """'key 1 2 3' -> {key: np.array([1,2,3])} (read_text.py behavior)."""
    dtype = np.int64 if "int" in loader_type else np.float32
    d = read_2columns_text(path)
    retval = {}
    for k, v in d.items():
        parts = v.split(",") if loader_type.startswith("csv") else v.split()
        retval[k] = np.asarray(parts, dtype=dtype)
    return retval


def read_wav(path: Union[Path, str]) -> Tuple[int, np.ndarray]:
    """-> (rate, float32 array in [-1, 1], mono shape (S,) or (S, C))."""
    if _sf is not None:  # pragma: no cover
        data, rate = _sf.read(str(path), dtype="float32")
        return rate, data
    path = str(path)
    with open(path, "rb") as f:
        head = f.read(12)
    if head[:4] != b"RIFF" or head[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE file: {path}")
    # find fmt chunk to detect float format
    with open(path, "rb") as f:
        f.seek(12)
        fmt_code, n_ch, rate, bits = None, None, None, None
        data_off, data_size = None, None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            cid, csize = hdr[:4], struct.unpack("<I", hdr[4:])[0]
            if cid == b"fmt ":
                fmt = f.read(csize)
                fmt_code, n_ch, rate = struct.unpack("<HHI", fmt[:8])
                bits = struct.unpack("<H", fmt[14:16])[0]
            elif cid == b"data":
                data_off, data_size = f.tell(), csize
                f.seek(csize + (csize & 1), 1)
            else:
                f.seek(csize + (csize & 1), 1)
    if fmt_code is None or data_off is None:
        raise ValueError(f"malformed wav: {path}")
    raw = np.memmap(path, dtype=np.uint8, mode="r",
                    offset=data_off, shape=(data_size,))
    if fmt_code == 1:  # PCM
        if bits == 16:
            x = raw.view(np.int16).astype(np.float32) / 32768.0
        elif bits == 32:
            x = raw.view(np.int32).astype(np.float32) / 2147483648.0
        elif bits == 8:
            x = (raw.view(np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported PCM bits={bits}")
    elif fmt_code == 3:  # IEEE float
        x = np.array(raw.view(np.float32))
    else:
        raise ValueError(f"unsupported wav format code {fmt_code}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch)
    return rate, np.array(x)


def write_wav(path: Union[Path, str], rate: int, data: np.ndarray):
    """float [-1,1] or int16 -> PCM16 wav."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    if data.dtype != np.int16:
        data = np.clip(data, -1.0, 1.0)
        data = (data * 32767.0).astype(np.int16)
    n_ch = 1 if data.ndim == 1 else data.shape[1]
    with wave.open(str(path), "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(data.tobytes())


class SoundScpReader:
    """wav.scp reader: key -> (rate, float32 array). Mirrors
    espnet2/fileio/sound_scp.py:81 (dict-like, lazy load)."""

    def __init__(self, path, dtype=np.float32, always_2d: bool = False):
        self.path = path
        self.dtype = dtype
        self.always_2d = always_2d
        self.data = read_2columns_text(path)

    def __getitem__(self, key) -> Tuple[int, np.ndarray]:
        entry = self.data[key]
        if entry.endswith("|"):
            raise RuntimeError(
                "piped wav.scp entries are not supported on-the-fly; "
                "run format_wav stage first")
        rate, arr = read_wav(entry)
        if self.always_2d and arr.ndim == 1:
            arr = arr[:, None]
        return rate, arr.astype(self.dtype)

    def keys(self):
        return self.data.keys()

    def __len__(self):
        return len(self.data)

    def __contains__(self, k):
        return k in self.data

    def __iter__(self):
        return iter(self.data)


class SoundScpWriter:
    """Write wavs + scp (espnet2/fileio/sound_scp.py writer behavior)."""

    def __init__(self, outdir, scpfile, format: str = "wav"):
        self.dir = Path(outdir)
        self.dir.mkdir(parents=True, exist_ok=True)
        Path(scpfile).parent.mkdir(parents=True, exist_ok=True)
        self.fscp = open(scpfile, "w", encoding="utf-8")
        self.format = format
        self.data = {}

    def __setitem__(self, key, value):
        rate, arr = value
        p = self.dir / f"{key}.{self.format}"
        write_wav(p, rate, arr)
        self.fscp.write(f"{key} {p}\n")
        self.data[key] = str(p)

    def close(self):
        self.fscp.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class NpyScpReader:
    """key -> np.load(path) (espnet2/fileio/npy_scp.py)."""

    def __init__(self, path):
        self.data = read_2columns_text(path)

    def __getitem__(self, key):
        return np.load(self.data[key])

    def keys(self):
        return self.data.keys()

    def __len__(self):
        return len(self.data)

    def __iter__(self):
        return iter(self.data)


class NpyScpWriter:
    def __init__(self, outdir, scpfile):
        self.dir = Path(outdir)
        self.dir.mkdir(parents=True, exist_ok=True)
        Path(scpfile).parent.mkdir(parents=True, exist_ok=True)
        self.fscp = open(scpfile, "w", encoding="utf-8")

    def __setitem__(self, key, value):
        p = self.dir / f"{key}.npy"
        np.save(p, value)
        self.fscp.write(f"{key} {p}\n")

    def close(self):
        self.fscp.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class DatadirWriter:
    """Nested text-map writer (espnet2/fileio/datadir_writer.py:8).

    w = DatadirWriter(dir); w["1best_recog"]["text"][key] = "hello"
    creates dir/1best_recog/text with 'key hello' lines.
    """

    def __init__(self, p: Union[Path, str]):
        self.path = Path(p)
        self.children = {}
        self.fd = None

    def __getitem__(self, key) -> "DatadirWriter":
        if self.fd is not None:
            raise RuntimeError("already opened as a file")
        if key not in self.children:
            self.children[key] = DatadirWriter(self.path / key)
        return self.children[key]

    def __setitem__(self, key: str, value: str):
        if self.children:
            raise RuntimeError("already a directory")
        if self.fd is None:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            self.fd = open(self.path, "w", encoding="utf-8")
        self.fd.write(f"{key} {value}\n")

    def close(self):
        if self.fd is not None:
            self.fd.close()
        for c in self.children.values():
            c.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class Hdf5Reader:
    """`hdf5` loader type (espnet2/train/dataset.py:252): the scp path
    is an HDF5 file whose datasets are keyed by utt-id (h5py)."""

    def __init__(self, path):
        import h5py
        self.file = h5py.File(path, "r")

    def __getitem__(self, key):
        return self.file[key][()]

    def keys(self):
        return list(self.file.keys())

    def __len__(self):
        return len(self.file)

    def __contains__(self, k):
        return k in self.file

    def __iter__(self):
        return iter(self.file)


class MultiColumnSoundReader:
    """`multi_columns_sound` (espnet2/fileio/multi_sound_scp.py): each
    wav.scp line lists several files whose waveforms stack as channels
    -> (n_samples, n_channels)."""

    def __init__(self, path, dtype=np.float32):
        self.data = {}
        for line in Path(path).read_text(encoding="utf-8").splitlines():
            if line.strip():
                k, rest = line.split(maxsplit=1)
                self.data[k] = rest.split()
        self.dtype = dtype

    def __getitem__(self, key):
        waves = []
        rate = None
        for p in self.data[key]:
            r, w = read_wav(p)
            rate = rate or r
            assert r == rate, "sampling-rate mismatch between columns"
            waves.append(np.asarray(w, self.dtype))
        n = min(len(w) for w in waves)
        return rate, np.stack([w[:n] for w in waves], axis=-1)

    def keys(self):
        return list(self.data)

    def __len__(self):
        return len(self.data)

    def __contains__(self, k):
        return k in self.data


class RttmReader:
    """`rttm` loader (espnet2/fileio/rttm.py): ESPnet-style RTTM with
    SPEAKER lines (start/duration in frame units) and an END line giving
    the total frame count per recording; returns a (T, n_spk) 0/1
    activity matrix."""

    def __init__(self, path):
        self.events: Dict[str, list] = {}
        self.total: Dict[str, int] = {}
        spk_ids: Dict[str, Dict[str, int]] = {}
        for line in Path(path).read_text(encoding="utf-8").splitlines():
            parts = line.split()
            if not parts:
                continue
            kind, reco = parts[0], parts[1]
            if kind == "END":
                self.total[reco] = int(float(parts[4]))
            elif kind == "SPEAKER":
                st, dur, spk = float(parts[3]), float(parts[4]), parts[7]
                sid = spk_ids.setdefault(reco, {})
                sid.setdefault(spk, len(sid))
                self.events.setdefault(reco, []).append(
                    (int(st), int(st + dur), sid[spk]))
        self.n_spk = {r: len(s) for r, s in spk_ids.items()}

    def __getitem__(self, key):
        T = self.total.get(
            key, max((e[1] for e in self.events.get(key, [])), default=0))
        n = max(self.n_spk.get(key, 1), 1)
        out = np.zeros((T, n), np.int32)
        for st, et, sid in self.events.get(key, []):
            out[st:min(et, T), sid] = 1
        return out

    def keys(self):
        return sorted(set(self.events) | set(self.total))

    def __len__(self):
        return len(self.keys())
