"""Scalar training logger.

Reference uses an optional tensorboardX ``SummaryWriter``
(``train_e2v.py:73-76``). Here: tensorboardX when importable, else a TSV
file with the same scalars — observability without hard dependencies.
"""

from __future__ import annotations

import os


class ScalarLogger:
    def __init__(self, logdir: str, enabled: bool = True):
        self.enabled = enabled
        self._tb = None
        self._tsv = None
        if not enabled:
            return
        os.makedirs(logdir, exist_ok=True)
        try:
            from tensorboardX import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(logdir)
        except Exception:
            self._tsv = open(os.path.join(logdir, "scalars.tsv"), "a")

    def scalar(self, tag: str, value: float, step: int):
        if not self.enabled:
            return
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        elif self._tsv is not None:
            self._tsv.write(f"{step}\t{tag}\t{value}\n")
            self._tsv.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._tsv is not None:
            self._tsv.close()
