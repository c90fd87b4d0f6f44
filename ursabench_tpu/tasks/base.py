"""Task protocol — parity with /root/reference/URSABench/tasks/task_base.py:
``reset`` / ``update_statistics(ensemble, output_performance)`` /
``get_performance_metrics``. Tasks consume stacked-pytree ``Ensemble``
objects; the per-batch per-member Python loop of the reference
(prediction.py:52-74) becomes a single vmapped forward per batch.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..inference.ensemble import Ensemble
from ..util import central_smoothing, predictive_entropy, softmax_probs


class _Task:
    def __init__(self, data_loader=None, num_classes=None, device=None):
        self.data_loader = data_loader
        self.num_classes = num_classes
        self.device = device  # accepted for parity; placement is XLA's job

    def reset(self):
        raise NotImplementedError

    def update_statistics(self, models, output_performance=False):
        raise NotImplementedError

    def get_performance_metrics(self):
        raise NotImplementedError


def accumulate_split(ensemble: Ensemble, split, smooth_probs: bool):
    """One pass over a DataSplit with all ensemble members vmapped.

    Returns (sum of per-member probs, sum of per-member entropies) as numpy,
    matching the accumulators of prediction.py:24-25 / ood_detection.py:18-21.
    ``smooth_probs`` selects whether the *accumulated probabilities* are
    centrally smoothed (OOD/Decision do: ood_detection.py:62-65; Prediction
    does not: prediction.py:60 — only the entropy input is smoothed there).
    """
    proba_chunks = []
    ent_chunks = []
    for bi, (x, _) in enumerate(split.batches()):
        logits = ensemble.logits_all(x, bi)  # (S, B, C)
        probs = softmax_probs(logits)
        smoothed = central_smoothing(probs)
        acc_probs = smoothed if smooth_probs else probs
        proba_chunks.append(np.asarray(jnp.sum(acc_probs, axis=0)))
        ent_chunks.append(np.asarray(jnp.sum(predictive_entropy(smoothed), axis=0)))
    return np.concatenate(proba_chunks), np.concatenate(ent_chunks)
