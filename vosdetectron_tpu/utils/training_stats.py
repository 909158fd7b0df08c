"""Training statistics: smoothed losses, ETA, iteration timing, JSONL log.

Rebuild of the reference's stats/logging stack
(reference: lib/utils/training_stats.py ~200 LoC 20-iter median smoothing +
ETA; lib/utils/timer.py ~40 LoC; tensorboardX scalar logging).

Emits human-readable console lines plus structured JSONL, and optionally
TensorBoard scalars via tensorboardX (reference: train_net_step.py's
--use_tfboard path writing smoothed losses through tensorboardX).
Window-median smoothing matches the reference's presentation.
"""

from __future__ import annotations

import collections
import json
import time
from typing import Dict, Optional


class Timer:
    """Wall-clock phase timer (reference: lib/utils/timer.py)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.total = 0.0
        self.calls = 0
        self._t0 = None

    def tic(self):
        self._t0 = time.time()

    def toc(self) -> float:
        dt = time.time() - self._t0
        self.total += dt
        self.calls += 1
        return dt

    @property
    def average(self) -> float:
        return self.total / max(self.calls, 1)


class TrainingStats:
    def __init__(self, log_period: int = 20, window: int = 20,
                 jsonl_path: Optional[str] = None,
                 tb_dir: Optional[str] = None):
        self.log_period = log_period
        self.window = window
        self.hist: Dict[str, collections.deque] = {}
        self.jsonl_path = jsonl_path
        self._last_time = time.time()
        self._iter_times: collections.deque = collections.deque(
            maxlen=window)
        self._tb = None
        if tb_dir:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(tb_dir)
            except Exception as e:  # noqa: BLE001 — TB is optional
                print(f"tensorboardX unavailable ({e}); JSONL only")

    def log(self, step: int, losses: Dict[str, float], max_iter: int):
        now = time.time()
        self._iter_times.append(now - self._last_time)
        self._last_time = now
        for k, v in losses.items():
            self.hist.setdefault(
                k, collections.deque(maxlen=self.window)).append(v)
        if (step + 1) % self.log_period:
            return
        med = {k: sorted(d)[len(d) // 2] for k, d in self.hist.items()}
        it_s = sorted(self._iter_times)[len(self._iter_times) // 2]
        eta_s = it_s * (max_iter - step - 1)
        eta = f"{int(eta_s // 3600)}:{int(eta_s % 3600 // 60):02d}:" \
              f"{int(eta_s % 60):02d}"
        parts = ", ".join(f"{k}: {v:.4f}" for k, v in sorted(med.items()))
        print(f"[step {step + 1}/{max_iter}] iter: {it_s * 1e3:.0f}ms, "
              f"eta: {eta}, {parts}", flush=True)
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps({"step": step + 1, "iter_ms":
                                    it_s * 1e3, **med}) + "\n")
        if self._tb is not None:
            for k, v in med.items():
                self._tb.add_scalar(f"train/{k}", v, step + 1)
            self._tb.add_scalar("train/iter_ms", it_s * 1e3, step + 1)

    def close(self):
        if self._tb is not None:
            self._tb.close()
