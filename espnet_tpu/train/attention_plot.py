"""Attention-map capture and heatmap plotting.

Behavioral contract: espnet2/main_funcs/calculate_all_attentions.py:30
(hook-based capture of every attention module's weights for one batch)
and espnet2/train/trainer.py:872 plot_attention (per-epoch heatmap PNGs
under exp/att_ws/).

TPU-first: instead of torch forward hooks, attention modules `sow` their
softmax weights into the flax "intermediates" collection; a single apply
with `mutable=["intermediates"]` materializes every map in one device
program (the sow is dead code — DCE'd — in normal training steps).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict

import jax
import numpy as np

logger = logging.getLogger(__name__)


def calculate_all_attentions(model, params, batch: Dict,
                             **apply_kwargs) -> Dict[str, np.ndarray]:
    """Run one forward with intermediates capture; returns
    {module_path: (B, H, Tq, Tk) attention weights}."""
    _, mods = model.apply(params, **batch, **apply_kwargs,
                          mutable=["intermediates"])
    inter = mods.get("intermediates", {})
    out = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,))
        elif isinstance(tree, (tuple, list)):
            # sow stores a tuple of sown values; take the first
            if tree:
                out["/".join(p for p in path if p != "attn")
                    or "attn"] = np.asarray(tree[0])
        else:
            out["/".join(path)] = np.asarray(tree)

    walk(inter, ())
    return {k: v for k, v in out.items() if v.ndim == 4}


def plot_attentions(att_maps: Dict[str, np.ndarray], out_dir, epoch: int,
                    uids=None, max_utts: int = 3):
    """Save heatmap PNGs: one figure per (module, utterance) with a
    subplot per head (trainer.py:872-953 layout)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # pragma: no cover
        logger.warning("matplotlib unavailable; skipping attention plots")
        return []
    out_dir = Path(out_dir)
    written = []
    for name, att in att_maps.items():
        B, H = att.shape[:2]
        for b in range(min(B, max_utts)):
            uid = uids[b] if uids is not None and b < len(uids) else f"utt{b}"
            fig, axes = plt.subplots(1, H, figsize=(3 * H, 3), squeeze=False)
            for h in range(H):
                axes[0][h].imshow(att[b, h], aspect="auto", origin="lower",
                                  interpolation="nearest")
                axes[0][h].set_title(f"head {h}", fontsize=8)
            fig.suptitle(f"{name} ep{epoch}", fontsize=9)
            safe = name.replace("/", ".")
            d = out_dir / uid
            d.mkdir(parents=True, exist_ok=True)
            p = d / f"{safe}.ep{epoch}.png"
            fig.savefig(p, dpi=80)
            plt.close(fig)
            written.append(p)
    return written


def make_att_plot_fn(model, batch_provider, max_utts: int = 3,
                     **apply_kwargs):
    """Build Trainer's att_plot_fn(params, epoch, out_dir): captures and
    plots attention for one fixed batch each epoch."""

    def fn(params, epoch, out_dir):
        got = batch_provider()
        if got is None:
            return
        uids, batch = got
        try:
            maps = calculate_all_attentions(model, params, batch,
                                            **apply_kwargs)
            plot_attentions(maps, out_dir, epoch, uids=uids,
                            max_utts=max_utts)
        except Exception as e:  # pragma: no cover
            logger.warning("attention plotting failed: %s", e)

    return fn
