"""Dependency-free TensorBoard scalar event writer.

Behavioral contract: espnet2/train/reporter.py:533
(tensorboard_add_scalar) — per-step scalars under tags
"<phase>_<name>" readable by standard TensorBoard.

This environment has no tensorboard/tensorboardX package, so the event
file is written directly: TFRecord framing (length + masked CRC32C) of
hand-encoded `tensorflow.Event` protobufs. Scalars only — attention
heatmaps go to exp/att_ws/*.png (trainer.py:872 contract), not TB.
"""

from __future__ import annotations

import os
import socket
import struct
import time
from pathlib import Path

# -- CRC32C (Castagnoli, reflected poly 0x82F63B78) ---------------------

_CRC_TABLE = []


def _crc_table():
    global _CRC_TABLE
    if not _CRC_TABLE:
        tbl = []
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            tbl.append(c)
        _CRC_TABLE = tbl
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    tbl = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = tbl[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# -- minimal protobuf encoding ------------------------------------------

def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _pb_double(field: int, v: float) -> bytes:
    return _tag(field, 1) + struct.pack("<d", v)


def _pb_float(field: int, v: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", v)


def _pb_int64(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _pb_bytes(field: int, v: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(v)) + v


def _pb_string(field: int, v: str) -> bytes:
    return _pb_bytes(field, v.encode("utf-8"))


def _event(wall_time: float, step: int = 0, file_version: str = None,
           summary: bytes = None) -> bytes:
    # tensorflow.Event: 1=wall_time(double) 2=step(int64)
    #                   3=file_version(string) 5=summary(message)
    msg = _pb_double(1, wall_time)
    if step:
        msg += _pb_int64(2, step)
    if file_version is not None:
        msg += _pb_string(3, file_version)
    if summary is not None:
        msg += _pb_bytes(5, summary)
    return msg


def _scalar_summary(tag: str, value: float) -> bytes:
    # Summary.Value: 1=tag(string) 2=simple_value(float)
    val = _pb_string(1, tag) + _pb_float(2, float(value))
    # Summary: repeated Value value = 1
    return _pb_bytes(1, val)


class SummaryWriter:
    """Append-only scalar event writer, API-compatible subset of
    torch.utils.tensorboard.SummaryWriter."""

    def __init__(self, log_dir):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        fname = (f"events.out.tfevents.{int(time.time())}."
                 f"{socket.gethostname()}.{os.getpid()}.0")
        self._f = open(self.log_dir / fname, "wb")
        self._write_record(_event(time.time(), file_version="brain.Event:2"))
        self._f.flush()

    def _write_record(self, data: bytes):
        hdr = struct.pack("<Q", len(data))
        self._f.write(hdr)
        self._f.write(struct.pack("<I", _masked_crc(hdr)))
        self._f.write(data)
        self._f.write(struct.pack("<I", _masked_crc(data)))

    def add_scalar(self, tag: str, value, global_step: int = 0):
        summ = _scalar_summary(tag, float(value))
        self._write_record(_event(time.time(), step=int(global_step),
                                  summary=summ))

    def flush(self):
        self._f.flush()

    def close(self):
        try:
            self._f.flush()
            self._f.close()
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
