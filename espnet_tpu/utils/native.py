"""ctypes bridge to the C++ runtime helpers (native/espnet_native.cpp).

Builds the shared library on first use (g++, cached next to the source);
every entry point has a pure-Python fallback so the framework works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = NATIVE_DIR / "espnet_native.cpp"
    so = NATIVE_DIR / "libespnet_native.so"
    try:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", str(src), "-o", str(so)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(so))
        lib.edit_distance_batch_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
        lib.pcm16_to_float.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        _LIB = lib
    except Exception as e:  # pragma: no cover
        logger.warning("native lib unavailable (%s); using python fallback",
                       e)
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _build_and_load() is not None


def edit_distance_batch(refs, hyps):
    """refs/hyps: lists of int sequences -> (n, 4) [sub, del, ins, len]."""
    lib = _build_and_load()
    n = len(refs)
    if lib is None:
        from espnet_tpu.utils.metrics import edit_distance
        return np.asarray([edit_distance(r, h) for r, h in zip(refs, hyps)],
                          dtype=np.int64)
    ref_flat = np.concatenate([np.asarray(r, np.int32) for r in refs]) \
        if refs and any(len(r) for r in refs) else np.zeros(0, np.int32)
    hyp_flat = np.concatenate([np.asarray(h, np.int32) for h in hyps]) \
        if hyps and any(len(h) for h in hyps) else np.zeros(0, np.int32)
    ref_off = np.zeros(n + 1, np.int64)
    hyp_off = np.zeros(n + 1, np.int64)
    np.cumsum([len(r) for r in refs], out=ref_off[1:])
    np.cumsum([len(h) for h in hyps], out=hyp_off[1:])
    outs = np.zeros((n, 4), np.int64)
    ref_flat = np.ascontiguousarray(ref_flat)
    hyp_flat = np.ascontiguousarray(hyp_flat)
    lib.edit_distance_batch_i32(
        ref_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ref_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        hyp_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        hyp_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, outs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return outs


def score_corpus(ref_texts, hyp_texts, unit: str = "word"):
    """sclite-equivalent corpus scoring through the native kernel.

    Returns dict with err_rate/sub/del/ins/ref_len.
    """
    vocab = {}

    def to_ids(text):
        toks = text.split() if unit == "word" else list(text.replace(" ", ""))
        return [vocab.setdefault(t, len(vocab)) for t in toks]

    refs = [to_ids(t) for t in ref_texts]
    hyps = [to_ids(t) for t in hyp_texts]
    outs = edit_distance_batch(refs, hyps)
    S, D, I, N = outs.sum(axis=0)
    return {"err_rate": float((S + D + I) / max(N, 1)), "sub": int(S),
            "del": int(D), "ins": int(I), "ref_len": int(N)}
