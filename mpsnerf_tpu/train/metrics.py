"""Scalar metric logging: the SummaryWriter-equivalent.

Behavioral reference: ``/root/reference/run_nerf_batch.py:482,585-604`` —
nine training scalars every ``i_print`` steps plus a console line.

Primary sink is a JSONL file (greppable, no heavyweight deps); TensorBoard
event files are written too when the ``tensorboard`` package is importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricWriter:
    def __init__(self, basedir: str, expname: str):
        self.dir = os.path.join(basedir, "summaries", expname)
        os.makedirs(self.dir, exist_ok=True)
        self._f = open(os.path.join(self.dir, "scalars.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(self.dir)
        except Exception:
            pass

    def add_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": step, "time": time.time(), **scalars}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, step)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
