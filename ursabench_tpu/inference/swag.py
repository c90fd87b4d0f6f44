"""SWAG: SWA-Gaussian posterior sampling.

Parity target: /root/reference/URSABench/inference/swag.py. The shipped
reference is broken in two compounding ways we do NOT replicate by default:
(1) ``weight_sample = self.weight_mean`` at swag.py:98,118 overwrites every
drawn sample with the mean, and (2) SWAG's sample_iterative never increments
``num_models_collected`` so the inherited ``_collect_model`` (swa.py:83-88)
keeps n=0 and the "running moments" collapse to the *last* SGD iterate
(variance == var_clamp). The default here is true SWAG — proper running
moments over the post-burn-in iterates and diag(+low-rank) Gaussian
sampling using the reference's own (dead-code) formula at swag.py:86-97.
Pass ``reference_bug_compat=True`` to reproduce the shipped behavior for
parity runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..util import ravel
from .ensemble import Ensemble
from .swa import SWA


class SWAG(SWA):
    _DEFAULT_HYP = {
        "swag_lr": 0.001, "swag_wd": 0.001, "lr_init": 0.001, "num_samples": 20,
        "momentum": 0.1, "burn_in_epochs": 100, "num_iterates": 50,
    }

    def __init__(self, hyperparameters, model=None, train=None,
                 model_loss="multi_class_linear_output", key=None, chains=1,
                 mesh=None, reference_bug_compat: bool = False,
                 **subspace_kwargs):
        self.reference_bug_compat = reference_bug_compat
        super().__init__(hyperparameters, model, train, model_loss, key, chains,
                         mesh, **subspace_kwargs)
        self.num_samples = int(self.hyperparameters.get("num_samples", 20))
        self.weight_variance = None

    def _collect_model_correct(self):
        w = ravel(self._state.params)
        n = float(self.num_models_collected)
        self.weight_mean = self.weight_mean * (n / (n + 1.0)) + w / (n + 1.0)
        self.sq_mean = self.sq_mean * (n / (n + 1.0)) + w ** 2 / (n + 1.0)
        self.subspace.collect_vector(w - self.weight_mean)
        self.num_models_collected += 1

    def _draw_weight_sample(self, full_cov: bool) -> jnp.ndarray:
        if self.reference_bug_compat:
            return self.weight_mean  # swag.py:98,118
        key = self.next_key()
        k_diag, k_low = jax.random.split(key)
        _, var = self._get_mean_and_variance()
        sample = self.weight_mean + jnp.sqrt(var) * jax.random.normal(
            k_diag, self.weight_mean.shape
        )
        if full_cov and getattr(self.subspace, "cov_mat_sqrt", None) is not None:
            cms = self.subspace.cov_mat_sqrt
            if cms.shape[0] > 1:
                z = jax.random.normal(k_low, (cms.shape[0],))
                # swag.py:90-95 formula
                sample = sample + (cms.T @ z) / (
                    (self.subspace.max_rank - 1) ** 0.5
                )
        return sample

    def sample_iterative(self, update_bn=True, val_loader=None,
                         debug_val_loss=False, full_cov=False):
        if not self.burnt_in:
            epochs = self.burn_in_epochs + self.num_iterates
            for epoch in range(epochs):
                self._run_epochs(1)
                if epoch >= self.burn_in_epochs:  # swag.py:81-82
                    if self.reference_bug_compat:
                        self._collect_model()  # n stays 0 -> last iterate
                    else:
                        self._collect_model_correct()
            self.burnt_in = True
            _, self.weight_variance = self._get_mean_and_variance()
        w = self._draw_weight_sample(full_cov)
        params = self._unravel(w)
        bstats = self._state.batch_stats
        if update_bn and bstats:
            bstats = self._bn_refresh(params, bstats)
        else:
            bstats = jax.tree.map(lambda x: x.copy(), bstats)
        return params, bstats

    def sample(self, num_samples=None, val_loader=None, debug_val_loss=False,
               full_cov=False) -> Ensemble:
        if num_samples is None:
            num_samples = self.num_samples
        draws = [
            self.sample_iterative(update_bn=True, full_cov=full_cov)
            for _ in range(num_samples)
        ]
        from ..util import tree_stack

        params = tree_stack([d[0] for d in draws])
        bstats = tree_stack([d[1] for d in draws])
        has_bn = bool(jax.tree.leaves(bstats))
        return Ensemble(
            self.module, params, bstats if has_bn else None, num_samples
        )
