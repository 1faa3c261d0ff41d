"""Observability: JSONL metric stream + stdout tee.

Replaces tensorboardX scalars + Print_Logger (code/train_dual.py:21-32,
134-136, 222-226).  Metrics go to `{run_dir}/metrics.jsonl`, one record per
event, machine-readable for plotting/benchmark harvesting; stdout is teed
to `training_info.txt`."""

from __future__ import annotations

import json
import sys
import time


class Tee:
    def __init__(self, path: str):
        self.terminal = sys.stdout
        self.log = open(path, "a")

    def write(self, msg: str):
        self.terminal.write(msg)
        self.log.write(msg)

    def flush(self):
        self.terminal.flush()
        self.log.flush()


class MetricLogger:
    def __init__(self, path: str):
        self.f = open(path, "a")
        self.t0 = time.time()

    def log(self, split: str, epoch: int, step: int | None = None, **metrics):
        rec = {
            "t": round(time.time() - self.t0, 3),
            "split": split,
            "epoch": epoch,
        }
        if step is not None:
            rec["step"] = step
        rec.update({k: float(v) for k, v in metrics.items()})
        self.f.write(json.dumps(rec) + "\n")
        self.f.flush()

    def close(self):
        self.f.close()
