"""Observability: structured metric logging.

The reference logs through print + optional wandb calls scattered across
every sampler (SURVEY.md §5: sghmc.py:88-98 etc.). Here logging is one
composable sink: JSONL to disk always works, wandb attaches when the
package + an active run exist, and ``silent()`` reproduces the reference's
stdout suppression for timing purity (util.py:40-50).
"""

from __future__ import annotations

import contextlib
import io
import json
import time
from typing import Optional


class MetricLogger:
    def __init__(self, path: Optional[str] = None, use_wandb: bool = False,
                 echo: bool = False):
        self.path = path
        self.echo = echo
        self._fh = open(path, "a") if path else None
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # type: ignore

                if wandb.run is not None:
                    self._wandb = wandb
            except ImportError:
                pass

    def log(self, metrics: dict, step: Optional[int] = None):
        record = {"ts": time.time(), **({"step": step} if step is not None else {}),
                  **metrics}
        if self._fh:
            self._fh.write(json.dumps(record) + "\n")
            self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        if self.echo:
            print(record)

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None


def silent(fn):
    """Decorator suppressing stdout during ``fn`` (timing purity,
    reference util.py:40-50)."""

    def wrapper(*args, **kwargs):
        with contextlib.redirect_stdout(io.StringIO()):
            return fn(*args, **kwargs)

    return wrapper
