"""SWA: stochastic weight averaging with subspace collection.

Parity target: /root/reference/URSABench/inference/swa.py — SGD with the
high-constant-then-decay schedule (:92-101), running first/second weight
moments over the flat parameter vector (:79-90), deviation vectors into a
Subspace, SWA-mean model with exact BN-buffer refresh (:103-104, 156-159).

The flat-vector moment updates ride on ``ravel``/``unraveler`` (util.py) and
run on device; BN refresh is the engine's single-scan exact pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.sgmcmc import sgd_momentum_update
from ..util import ravel, unraveler
from .base import _Inference
from .engine import TrainState, make_bn_refresh_fn, make_epoch_fn
from .ensemble import Ensemble
from .subspaces import Subspace


def _sgd_hyp_update(params, mom, grads, hyp, *, lr, noise_on, is_first_step,
                    key):
    del noise_on, key
    return sgd_momentum_update(
        params, mom, grads, lr=lr, momentum=hyp["momentum"],
        weight_decay=hyp["weight_decay"], is_first_step=is_first_step,
    )


def _swa_schedule_hyp_lr(hyp, epoch, batch_idx, step):
    """_schedule (swa.py:92-101): constant, linear decay, then swag_lr."""
    del batch_idx, step
    t = epoch / hyp["burn_in_epochs"]
    lr_ratio = hyp["swag_lr"] / hyp["lr_init"]
    factor = jnp.where(
        t <= 0.5, 1.0,
        jnp.where(t <= 0.9, 1.0 - (1.0 - lr_ratio) * (t - 0.5) / 0.4, lr_ratio),
    )
    return hyp["lr_init"] * factor


class SWA(_Inference):
    _DEFAULT_HYP = {
        "swag_lr": 0.001, "swag_wd": 0.001, "lr_init": 0.001, "num_samples": 20,
        "momentum": 0.1, "burn_in_epochs": 100, "num_iterates": 50,
    }
    VAR_CLAMP = 1e-30

    def __init__(self, hyperparameters, model=None, train=None,
                 model_loss="multi_class_linear_output", key=None, chains=1,
                 mesh=None, **subspace_kwargs):
        if chains not in (1, None):
            raise NotImplementedError(
                "SWA/SWAG run a single trajectory (the running weight moments "
                "are chain-global); use SGHMC/SGLD/DeepEnsemble for chains"
            )
        # a ('chain','data') mesh with data>1 shards each SGD minibatch over
        # 'data' (pure data parallelism for the single trajectory; the state
        # is replicated and grads arrive as one psum'd global mean)
        if mesh is not None and mesh.shape.get("chain", 1) > 1:
            raise ValueError(
                "SWA/SWAG are single-trajectory: use a mesh with chain=1 "
                "(all devices on the 'data' axis), e.g. "
                "parallel.make_mesh(chain_devices=1)"
            )
        super().__init__(hyperparameters, model, train, model_loss, key, 1,
                         mesh)
        if hyperparameters is None:
            hyperparameters = dict(self._DEFAULT_HYP)
        self._subspace_kwargs = dict(subspace_kwargs)
        self._setup(hyperparameters)

    def _setup(self, hyp):
        self.hyperparameters = hyp
        self.burn_in_epochs = int(hyp["burn_in_epochs"])
        self.num_iterates = int(hyp["num_iterates"])
        self.num_samples = int(hyp.get("num_samples", self.num_iterates))
        self.momentum = float(hyp["momentum"])
        self.lr_init = float(hyp["lr_init"])
        self.swag_lr = float(hyp["swag_lr"])
        self.swag_wd = float(hyp["swag_wd"])
        self.subspace_type = hyp.get("subspace_type", "pca")
        self.burnt_in = False
        self.epochs_run = 0

        variables = self.fresh_variables()
        params = variables["params"]
        self._unravel = unraveler(params)
        self.num_parameters = ravel(params).shape[0]
        self.weight_mean = jnp.zeros(self.num_parameters)
        self.sq_mean = jnp.zeros(self.num_parameters)
        self.num_models_collected = 0
        self.subspace = Subspace.create(
            self.subspace_type, num_parameters=self.num_parameters,
            **self._subspace_kwargs,
        )
        self.cov_factor = None

        self._hyp_scalars = {
            "lr_init": jnp.float32(self.lr_init),
            "swag_lr": jnp.float32(self.swag_lr),
            "burn_in_epochs": jnp.float32(max(self.burn_in_epochs, 1)),
            "momentum": jnp.float32(self.momentum),
            "weight_decay": jnp.float32(self.swag_wd),
        }
        if getattr(self, "_epoch_fn", None) is None:
            self._epoch_fn = make_epoch_fn(
                self.module, self.train, lr_fn=_swa_schedule_hyp_lr,
                update_fn=_sgd_hyp_update, mesh=self.mesh,
            )
            self._bn_refresh = make_bn_refresh_fn(self.module, self.train)
        self._state = TrainState(
            params=params,
            momentum=jax.tree.map(jnp.zeros_like, params),
            batch_stats=variables.get("batch_stats", {}),
            key=self.next_key(),
            step=jnp.zeros((), jnp.int32),
        )

    def update_hyp(self, hyperparameters, **subspace_kwargs):
        if subspace_kwargs:
            self._subspace_kwargs = dict(subspace_kwargs)
        self._setup(hyperparameters)

    # -- moment collection (swa.py:79-90) -------------------------------------

    def _collect_model(self):
        # NOTE: mirrors the reference exactly, including the quirk that
        # sample_iterative increments num_models_collected *before* the epoch
        # runs (swa.py:130), so the first collected model is averaged with a
        # phantom zero vector (n=1 here => mean = w/2).
        w = ravel(self._state.params)
        n = float(self.num_models_collected)
        self.weight_mean = self.weight_mean * (n / (n + 1.0)) + w / (n + 1.0)
        self.sq_mean = self.sq_mean * (n / (n + 1.0)) + w ** 2 / (n + 1.0)
        self.subspace.collect_vector(w - self.weight_mean)

    def _get_mean_and_variance(self):
        variance = jnp.clip(self.sq_mean - self.weight_mean ** 2, self.VAR_CLAMP)
        return self.weight_mean, variance

    def fit(self):
        if self.cov_factor is None:
            self.cov_factor = self.subspace.get_space()

    def get_space(self, export_cov_factor=True):
        mean, variance = self._get_mean_and_variance()
        if not export_cov_factor:
            return mean, variance
        self.fit()
        return mean, variance, self.cov_factor

    # -- sampling --------------------------------------------------------------

    def _run_epochs(self, epochs: int):
        for _ in range(epochs):
            self._state, _ = self._epoch_fn(
                self._state, jnp.asarray(self.epochs_run, jnp.float32),
                jnp.asarray(0.0), self._hyp_scalars,
            )
            self.epochs_run += 1

    def _swa_variables(self, update_bn: bool):
        params = self._unravel(self.weight_mean)
        bstats = self._state.batch_stats
        if update_bn and bstats:
            bstats = self._bn_refresh(params, bstats)
        else:
            # copy: live state buffers are donated back to the next epoch call
            bstats = jax.tree.map(lambda x: x.copy(), bstats)
        return params, bstats

    def sample_iterative(self, update_bn_swa=True, val_loader=None,
                         debug_val_loss=False):
        epochs = self.burn_in_epochs + 1 if not self.burnt_in else 1
        self.burnt_in = True
        self.num_models_collected += 1  # pre-increment, see _collect_model note
        self._run_epochs(epochs)
        self._collect_model()
        return self._swa_variables(update_bn=update_bn_swa)

    def sample(self, num_samples=None, val_loader=None, debug_val_loss=False) -> Ensemble:
        if num_samples is None:
            num_samples = self.num_iterates
        for i in range(num_samples):
            params, bstats = self.sample_iterative(
                update_bn_swa=(i == num_samples - 1)
            )
        # the reference returns N references to the same SWA-mean module
        # (swa.py:160 returns self.swag_model without copying) — the ensemble
        # is the final mean replicated.
        stack = lambda t: jax.tree.map(
            lambda x: jnp.broadcast_to(x, (num_samples,) + x.shape), t
        )
        has_bn = bool(jax.tree.leaves(bstats))
        return Ensemble(
            self.module, stack(params), stack(bstats) if has_bn else None,
            num_samples,
        )
