"""Metrics logging: tensorboard-compatible + JSONL fallback + throughput.

Superset of the reference's observability (`train.py:165,218-229`):
tensorboard scalars when available, an always-on JSONL event log, and a
rays/sec throughput counter (SURVEY.md §5.1 asks for this as a superset of
the reference's wall-clock prints).
"""
from __future__ import annotations

import json
import os
import time


class MetricsLogger:
    def __init__(self, log_dir):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl = open(os.path.join(log_dir, "events.jsonl"), "a")
        self.tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def add_scalar(self, tag, value, step):
        value = float(value)
        self.jsonl.write(
            json.dumps({"tag": tag, "value": value, "step": int(step),
                        "t": time.time()})
            + "\n"
        )
        if self.tb is not None:
            self.tb.add_scalar(tag, value, step)

    def flush(self):
        self.jsonl.flush()
        if self.tb is not None:
            self.tb.flush()

    def close(self):
        self.flush()
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()


class Throughput:
    """rays/sec counter over a sliding window of steps."""

    def __init__(self, rays_per_step):
        self.rays_per_step = rays_per_step
        self.t0 = time.perf_counter()
        self.steps = 0

    def tick(self, n=1):
        self.steps += n

    def rate(self):
        dt = time.perf_counter() - self.t0
        return self.steps * self.rays_per_step / max(dt, 1e-9)

    def reset(self):
        self.t0 = time.perf_counter()
        self.steps = 0
