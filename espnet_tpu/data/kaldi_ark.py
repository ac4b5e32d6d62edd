"""Pure-Python Kaldi binary ark/scp matrix I/O.

Behavioral contract: the reference reads/writes Kaldi features through
the external `kaldiio` package (espnet2/fileio/*, train/dataset.py:252
"kaldi_ark"); that package is not available offline, so this module
implements the on-disk format directly:

- ark entry:  `<key> \\0B<T> ` where T is "FM"/"DM" (float/double
  matrix) or "FV"/"DV" (vector); each dimension is `\\x04<int32>`;
  data is row-major little-endian.
- scp line:   `<key> <ark-path>:<byte-offset>` pointing at the `\\0B`.

Compressed matrices (CM*) are not produced by this toolkit and raise a
clear error on read.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Dict, Tuple, Union

import numpy as np

_TYPES = {b"FM": np.float32, b"DM": np.float64,
          b"FV": np.float32, b"DV": np.float64}


def _read_int32(f) -> int:
    size = f.read(1)
    assert size == b"\x04", f"bad int size byte {size!r}"
    return struct.unpack("<i", f.read(4))[0]


def read_mat(f) -> np.ndarray:
    """Read one binary matrix/vector at the current position (after the
    key and space, at the \\0B marker)."""
    binmark = f.read(2)
    if binmark != b"\x00B":
        raise ValueError(f"not a Kaldi binary entry (marker {binmark!r})")
    token = b""
    while not token.endswith(b" "):
        token += f.read(1)
    token = token.strip()
    if token.startswith(b"CM"):
        raise ValueError("compressed Kaldi matrices are not supported")
    if token not in _TYPES:
        raise ValueError(f"unsupported Kaldi type {token!r}")
    dtype = _TYPES[token]
    if token.endswith(b"V"):
        n = _read_int32(f)
        return np.frombuffer(f.read(n * dtype().itemsize), dtype).copy()
    rows = _read_int32(f)
    cols = _read_int32(f)
    data = np.frombuffer(f.read(rows * cols * dtype().itemsize), dtype)
    return data.reshape(rows, cols).copy()


def write_mat(f, arr: np.ndarray) -> int:
    """Write one binary entry; returns the byte offset of the marker."""
    offset = f.tell()
    arr = np.asarray(arr)
    if arr.dtype == np.float64:
        tok = b"DM" if arr.ndim == 2 else b"DV"
    else:
        arr = arr.astype(np.float32)
        tok = b"FM" if arr.ndim == 2 else b"FV"
    f.write(b"\x00B" + tok + b" ")
    for d in arr.shape:
        f.write(b"\x04" + struct.pack("<i", d))
    f.write(arr.tobytes())
    return offset


class KaldiArkWriter:
    """writer[key] = array -> feats.ark + feats.scp (kaldiio
    WriteHelper('ark,scp:...') equivalent)."""

    def __init__(self, ark_path: Union[str, Path],
                 scp_path: Union[str, Path]):
        self.ark_path = Path(ark_path)
        self.ark_path.parent.mkdir(parents=True, exist_ok=True)
        self.fark = open(self.ark_path, "wb")
        self.fscp = open(scp_path, "w", encoding="utf-8")

    def __setitem__(self, key: str, arr: np.ndarray):
        self.fark.write(key.encode() + b" ")
        offset = write_mat(self.fark, arr)
        self.fscp.write(f"{key} {self.ark_path}:{offset}\n")

    def close(self):
        self.fark.close()
        self.fscp.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class KaldiScpReader:
    """feats.scp -> arrays via (path, offset) random access."""

    def __init__(self, scp_path: Union[str, Path]):
        self.entries: Dict[str, Tuple[str, int]] = {}
        for line in Path(scp_path).read_text(encoding="utf-8").splitlines():
            if not line.strip():
                continue
            key, loc = line.split(maxsplit=1)
            path, _, off = loc.strip().rpartition(":")
            self.entries[key] = (path, int(off))

    def __getitem__(self, key: str) -> np.ndarray:
        path, off = self.entries[key]
        with open(path, "rb") as f:
            f.seek(off)
            return read_mat(f)

    def keys(self):
        return list(self.entries)

    def __len__(self):
        return len(self.entries)

    def __contains__(self, k):
        return k in self.entries

    def __iter__(self):
        return iter(self.entries)
