"""Metric aggregation with weighted averages.

Behavioral contract: espnet2/train/reporter.py — (phase, name)-keyed
weighted means per epoch (:44-109), epoch log lines, best-epoch queries
for checkpoint selection, state_dict for resume.
"""

from __future__ import annotations

import json
import logging
import time
from collections import defaultdict
from typing import Dict, Optional, Tuple


class SubReporter:
    """Accumulates weighted sums for one (epoch, phase)."""

    def __init__(self, phase: str, epoch: int):
        self.phase = phase
        self.epoch = epoch
        self._sum: Dict[str, float] = defaultdict(float)
        self._weight: Dict[str, float] = defaultdict(float)
        self._count = 0
        self._start = time.perf_counter()

    def register(self, stats: Dict[str, float], weight: Optional[float] = None):
        self._count += 1
        for k, v in stats.items():
            if v is None:
                continue
            v = float(v)
            w = float(weight) if weight is not None else 1.0
            self._sum[k] += v * w
            self._weight[k] += w

    def mean(self, key: str) -> float:
        return self._sum[key] / max(self._weight[key], 1e-20)

    def means(self) -> Dict[str, float]:
        return {k: self.mean(k) for k in self._sum}

    @property
    def count(self):
        return self._count

    def elapsed(self):
        return time.perf_counter() - self._start

    def log_message(self, start: int = 0) -> str:
        parts = [f"{k}={self.mean(k):.3f}" for k in sorted(self._sum)]
        return (f"{self.epoch}epoch:{self.phase}:"
                f"{self._count}batches: " + ", ".join(parts))


class Reporter:
    """Epoch-keyed store of finished SubReporters."""

    def __init__(self):
        self.stats: Dict[int, Dict[str, Dict[str, float]]] = {}
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def start_epoch(self, phase: str, epoch: Optional[int] = None) -> SubReporter:
        return SubReporter(phase, epoch if epoch is not None else self.epoch)

    def finish_epoch(self, sub: SubReporter):
        self.stats.setdefault(sub.epoch, {})[sub.phase] = sub.means()
        logging.info(sub.log_message())

    def get_value(self, phase: str, key: str, epoch: Optional[int] = None):
        e = epoch if epoch is not None else self.epoch
        return self.stats[e][phase][key]

    def has(self, phase: str, key: str, epoch: Optional[int] = None) -> bool:
        e = epoch if epoch is not None else self.epoch
        return key in self.stats.get(e, {}).get(phase, {})

    def best_epoch(self, phase: str, key: str, mode: str = "min"
                   ) -> Tuple[int, float]:
        assert mode in ("min", "max")
        items = [(e, p[phase][key]) for e, p in self.stats.items()
                 if phase in p and key in p[phase]]
        if not items:
            return -1, float("inf") if mode == "min" else float("-inf")
        return (min if mode == "min" else max)(items, key=lambda x: x[1])

    def sort_epochs(self, phase: str, key: str, mode: str = "min"):
        items = [(e, p[phase][key]) for e, p in self.stats.items()
                 if phase in p and key in p[phase]]
        return [e for e, _ in sorted(items, key=lambda x: x[1],
                                     reverse=(mode == "max"))]

    def state_dict(self):
        return {"stats": {str(e): v for e, v in self.stats.items()},
                "epoch": self.epoch}

    def load_state_dict(self, d):
        self.stats = {int(e): v for e, v in d["stats"].items()}
        self.epoch = d["epoch"]

    def to_json(self) -> str:
        return json.dumps(self.state_dict())

    def matplotlib_plot(self, output_dir):
        """Per-metric PNG curves over epochs
        (reporter.py:484 contract). Best-effort: skipped without
        matplotlib."""
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:  # pragma: no cover
            return
        from pathlib import Path
        out = Path(output_dir)
        out.mkdir(parents=True, exist_ok=True)
        keys = set()
        for phases in self.stats.values():
            for phase, d in phases.items():
                keys.update(d.keys())
        epochs = sorted(self.stats)
        for key in keys:
            fig, ax = plt.subplots()
            plotted = False
            for phase in ("train", "valid"):
                xs = [e for e in epochs
                      if phase in self.stats[e]
                      and key in self.stats[e][phase]]
                if not xs:
                    continue
                ys = [self.stats[e][phase][key] for e in xs]
                ax.plot(xs, ys, label=phase, marker="x")
                plotted = True
            if plotted:
                ax.set_xlabel("epoch")
                ax.set_ylabel(key)
                ax.legend()
                fig.savefig(out / f"{key}.png")
            plt.close(fig)
