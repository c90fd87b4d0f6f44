"""Distilled-posterior tasks.

Parity targets: /root/reference/URSABench/tasks/prediction_distilled.py and
ood_detection_distilled.py. The "ensemble" is a pair of deterministic
models: member 0 predicts BMA class probabilities, member 1 predicts the
log of the expected data entropy directly (``.exp()`` applied at read time,
prediction_distilled.py:58).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import metrics as M
from ..util import central_smoothing, predictive_entropy, softmax_probs
from .base import _Task
from .prediction import Prediction

__all__ = ["DistilledPair", "PredictionDistilled", "OODDetectionDistilled"]


@dataclass
class DistilledPair:
    """(prediction model, expected-data-uncertainty model)."""

    pred_module: Any
    pred_variables: dict
    unc_module: Any
    unc_variables: dict

    def __post_init__(self):
        self._logits = jax.jit(
            lambda x: self.pred_module.apply(self.pred_variables, x, train=False)
        )
        self._log_entropy = jax.jit(
            lambda x: self.unc_module.apply(self.unc_variables, x, train=False)
        )

    def probs(self, x):
        return softmax_probs(self._logits(x))

    def entropy(self, x):
        return jnp.exp(self._log_entropy(x)).reshape(-1)


def _accumulate_pair(pair: DistilledPair, split, smooth_probs: bool):
    probs_chunks, ent_chunks = [], []
    for x, _ in split.batches():
        p = pair.probs(x)
        if smooth_probs:
            p = central_smoothing(p)
        probs_chunks.append(np.asarray(p))
        ent_chunks.append(np.asarray(pair.entropy(x)))
    return np.concatenate(probs_chunks), np.concatenate(ent_chunks)


class PredictionDistilled(Prediction):
    """Same metric surface as Prediction; one statistics pass counts as a
    single collected sample (prediction_distilled.py:40)."""

    def update_statistics(self, models: DistilledPair, output_performance=True,
                          smoothing=True):
        if not isinstance(models, DistilledPair):
            raise TypeError("PredictionDistilled needs a DistilledPair")
        self.num_samples_collected += 1
        probs, ent = _accumulate_pair(models, self.split, smooth_probs=False)
        self.ensemble_proba += probs
        self.expected_data_uncertainty += ent
        if output_performance:
            return self.get_performance_metrics(output_performance, smoothing)


class OODDetectionDistilled(_Task):
    def __init__(self, data_loader=None, num_classes=None, device=None):
        super().__init__(data_loader, num_classes, device)
        self.in_split = data_loader["in_distribution_test"]
        self.out_split = data_loader["out_distribution_test"]
        self.num_classes = num_classes
        self.reset()

    def reset(self):
        self.in_proba = np.zeros((self.in_split.n, self.num_classes))
        self.out_proba = np.zeros((self.out_split.n, self.num_classes))
        self.in_data_unc = np.zeros(self.in_split.n)
        self.out_data_unc = np.zeros(self.out_split.n)
        self.num_samples_collected = 0

    def update_statistics(self, models: DistilledPair, output_performance=True):
        if not isinstance(models, DistilledPair):
            raise TypeError("OODDetectionDistilled needs a DistilledPair")
        self.num_samples_collected += 1
        p_in, e_in = _accumulate_pair(models, self.in_split, smooth_probs=True)
        self.in_proba += p_in
        self.in_data_unc += e_in
        # The reference uses the *smoothed-prob entropy* (not the distilled
        # head) on the OOD split (ood_detection_distilled.py:84-86).
        p_out, _ = _accumulate_pair(models, self.out_split, smooth_probs=True)
        self.out_proba += p_out
        self.out_data_unc += np.asarray(
            predictive_entropy(jnp.asarray(p_out))
        )
        if output_performance:
            return self.get_performance_metrics()

    def get_performance_metrics(self):
        n = self.num_samples_collected
        in_total = predictive_entropy(jnp.asarray(self.in_proba / n))
        out_total = predictive_entropy(jnp.asarray(self.out_proba / n))
        in_model = in_total - jnp.asarray(self.in_data_unc / n)
        out_model = out_total - jnp.asarray(self.out_data_unc / n)
        labels = jnp.concatenate([
            jnp.ones(self.out_split.n), jnp.zeros(self.in_split.n)
        ])
        return {
            "total_uncertainty_auroc": float(
                M.auroc(labels, jnp.concatenate([out_total, in_total]))
            ),
            "model_uncertainty_auroc": float(
                M.auroc(labels, jnp.concatenate([out_model, in_model]))
            ),
        }
