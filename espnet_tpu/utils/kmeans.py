"""Mini-batch k-means for SSL unit extraction.

Behavioral contract: the reference's HuBERT pipelines fit sklearn
MiniBatchKMeans over MFCC / transformer-layer features and dump
frame-level cluster labels as pseudo-targets
(egs2/TEMPLATE/hubert1 + espnet2 `sklearn_km.py`-style scripts); BEATs
re-estimates tokenizer codebooks between iterations. This is the same
Lloyd's algorithm vectorized in numpy (fits on host; assignment is one
matmul and also exposed as a jittable helper).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _assign(x: np.ndarray, centers: np.ndarray) -> np.ndarray:
    """Nearest center per row via the |x|^2 - 2xc + |c|^2 expansion
    (one matmul — MXU/BLAS friendly)."""
    d = (np.sum(x * x, axis=1, keepdims=True)
         - 2.0 * (x @ centers.T)
         + np.sum(centers * centers, axis=1)[None, :])
    return np.argmin(d, axis=1)


def fit_kmeans(x: np.ndarray, n_clusters: int, n_iter: int = 20,
               batch_size: int = 16384, seed: int = 0,
               tol: float = 1e-4) -> Tuple[np.ndarray, float]:
    """-> (centers (k, D), inertia). k-means++-lite init (distance-
    weighted sampling) + mini-batch Lloyd updates."""
    rng = np.random.RandomState(seed)
    n, d = x.shape
    k = min(n_clusters, n)
    # k-means++ seeding on a subsample
    sub = x[rng.choice(n, size=min(n, 4 * batch_size), replace=False)]
    centers = [sub[rng.randint(len(sub))]]
    for _ in range(1, k):
        dist = np.min(
            [np.sum((sub - c) ** 2, axis=1) for c in centers], axis=0)
        p = dist / max(dist.sum(), 1e-12)
        centers.append(sub[rng.choice(len(sub), p=p)])
    centers = np.stack(centers)
    counts = np.ones(k)
    prev_inertia = np.inf
    for it in range(n_iter):
        idx = rng.choice(n, size=min(batch_size, n), replace=False)
        xb = x[idx]
        a = _assign(xb, centers)
        for j in np.unique(a):
            sel = xb[a == j]
            counts[j] += len(sel)
            lr = len(sel) / counts[j]
            centers[j] = (1 - lr) * centers[j] + lr * sel.mean(axis=0)
        inertia = float(np.mean(
            np.sum((xb - centers[a]) ** 2, axis=1)))
        if abs(prev_inertia - inertia) < tol * max(inertia, 1e-12):
            break
        prev_inertia = inertia
    full_a = _assign(x[:min(n, 4 * batch_size)],
                     centers)
    inertia = float(np.mean(np.sum(
        (x[:min(n, 4 * batch_size)] - centers[full_a]) ** 2, axis=1)))
    return centers, inertia


def kmeans_labels(x: np.ndarray, centers: np.ndarray,
                  chunk: int = 65536) -> np.ndarray:
    """Assign every row (chunked to bound memory)."""
    out = np.empty((len(x),), np.int32)
    for i in range(0, len(x), chunk):
        out[i:i + chunk] = _assign(x[i:i + chunk], centers)
    return out


def dump_km_labels(feats_iter, centers: np.ndarray, out_path) -> int:
    """Write `uid lab lab lab ...` lines (the HuBERT pseudo-label dump
    format consumed as text_int data). feats_iter yields (uid, (T, D))."""
    n = 0
    with open(out_path, "w", encoding="utf-8") as f:
        for uid, feats in feats_iter:
            labs = kmeans_labels(np.asarray(feats, np.float32), centers)
            f.write(uid + " " + " ".join(map(str, labs.tolist())) + "\n")
            n += 1
    return n
