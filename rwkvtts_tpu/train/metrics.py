"""Training metrics/logging: KT/s, Gtokens, loss — wandb-compatible but
file-first.

The reference logs loss/KT/s/Gtokens + per-group LR to wandb
(train_..._properties.py:244-268,563-577). Here metrics go to a JSONL file
(always) and to wandb when the package + env are present (gated import),
with rank-0 gating for multi-host runs.
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Optional

import jax

log = logging.getLogger("rwkvtts_tpu")


def setup_logging(level: Optional[str] = None) -> None:
    level = level or os.environ.get("LOG_LEVEL", "INFO")
    logging.basicConfig(
        level=getattr(logging, level.upper(), logging.INFO),
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )


def is_rank0() -> bool:
    return jax.process_index() == 0


class MetricLogger:
    def __init__(self, run_dir: str, project: Optional[str] = None, run_name: Optional[str] = None):
        self.run_dir = run_dir
        self._file = None
        self._wandb = None
        if is_rank0():
            os.makedirs(run_dir, exist_ok=True)
            self._file = open(os.path.join(run_dir, "metrics.jsonl"), "a")
            if project:
                try:
                    import wandb

                    self._wandb = wandb.init(project=project, name=run_name, dir=run_dir)
                except Exception:
                    log.info("wandb unavailable; metrics go to %s only", run_dir)
        self._t0 = time.perf_counter()
        self._tokens_total = 0

    def log(self, step: int, metrics: Dict[str, Any], tokens: int = 0) -> None:
        if tokens:
            self._tokens_total += int(tokens)
        now = time.perf_counter()
        rec = {
            "step": step,
            "time": now,
            "gtokens": self._tokens_total / 1e9,
            **{k: float(v) for k, v in metrics.items()},
        }
        if self._file is not None:
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()
        if self._wandb is not None:
            self._wandb.log(rec, step=step)

    def close(self):
        if self._file is not None:
            self._file.close()
        if self._wandb is not None:
            self._wandb.finish()


class Throughput:
    """KT/s window counter (reference prints KT/s per step window)."""

    def __init__(self):
        self.t_last = time.perf_counter()
        self.tok_window = 0

    def update(self, n_tokens: int) -> Optional[float]:
        self.tok_window += int(n_tokens)
        now = time.perf_counter()
        dt = now - self.t_last
        if dt >= 1.0:
            kts = self.tok_window / dt / 1e3
            self.t_last = now
            self.tok_window = 0
            return kts
        return None
