"""EER + minDCF (espnet2/utils/eer.py contract) — pure numpy."""

from __future__ import annotations

import numpy as np


def compute_eer(scores: np.ndarray, labels: np.ndarray):
    """scores: similarity scores; labels: 1=target, 0=nontarget.
    Returns (eer, threshold)."""
    order = np.argsort(scores)[::-1]
    labels = np.asarray(labels)[order]
    scores = np.asarray(scores)[order]
    n_target = max(labels.sum(), 1)
    n_non = max(len(labels) - labels.sum(), 1)
    fa = np.cumsum(1 - labels) / n_non          # false accepts at threshold
    fr = 1.0 - np.cumsum(labels) / n_target     # false rejects
    idx = np.nanargmin(np.abs(fa - fr))
    eer = (fa[idx] + fr[idx]) / 2.0
    return float(eer), float(scores[idx])


def compute_min_dcf(scores, labels, p_target: float = 0.05,
                    c_miss: float = 1.0, c_fa: float = 1.0):
    order = np.argsort(scores)[::-1]
    labels = np.asarray(labels)[order]
    n_target = max(labels.sum(), 1)
    n_non = max(len(labels) - labels.sum(), 1)
    fa = np.cumsum(1 - labels) / n_non
    fr = 1.0 - np.cumsum(labels) / n_target
    dcf = c_miss * fr * p_target + c_fa * fa * (1 - p_target)
    dcf_default = min(c_miss * p_target, c_fa * (1 - p_target))
    return float(dcf.min() / dcf_default)
