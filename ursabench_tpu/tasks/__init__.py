"""Evaluation tasks (parity with /root/reference/URSABench/tasks/)."""

from .base import _Task
from .prediction import Prediction

__all__ = ["_Task", "Prediction"]
