"""OOD detection task — total- and model-uncertainty AUROC.

Parity target: /root/reference/URSABench/tasks/ood_detection.py. Unlike
Prediction, OOD accumulates *smoothed* probabilities as well as smoothed
per-member entropy (ood_detection.py:62-65); OOD points are labeled 1
(:118-119).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..inference.ensemble import Ensemble
from ..ops import metrics as M
from ..util import predictive_entropy
from .base import _Task, accumulate_split

__all__ = ["OODDetection"]


class OODDetection(_Task):
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

    def update_statistics(self, models: Ensemble, output_performance=True):
        self.num_samples_collected += models.num_members
        p_in, e_in = accumulate_split(models, self.in_split, smooth_probs=True)
        p_out, e_out = accumulate_split(models, self.out_split, smooth_probs=True)
        self.in_proba += p_in
        self.out_proba += p_out
        self.in_data_unc += e_in
        self.out_data_unc += e_out
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
        total = jnp.concatenate([out_total, in_total])
        model = jnp.concatenate([out_model, in_model])
        return {
            "total_uncertainty_auroc": float(M.auroc(labels, total)),
            "model_uncertainty_auroc": float(M.auroc(labels, model)),
        }
