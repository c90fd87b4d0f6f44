"""SGHMC / SGLD / cSGHMC / cSGLD samplers.

Parity targets:
- SGHMC epoch protocol + cosine LR: /root/reference/URSABench/inference/sghmc.py
  (burn_in+1 epochs on first draw then 1 epoch per draw, sghmc.py:66-71;
  CosineAnnealingLR over burn_in+num_samples epochs, :44-45; momentum=1-alpha,
  weight_decay=1/prior_std**2, :38-39). Note the reference's Langevin-noise
  gate at sghmc.py:83 (`epoch > 0.8*epochs or self.burnt_in`) is vacuously
  True because burnt_in is set before the loop (:69) — noise is always on;
  we reproduce that behavior.
- SGLD = SGHMC with alpha=1 (momentum 0): sgld.py:22-29.
- cSGHMC cyclic per-batch cosine LR + cycle-tail noise gating + harvest
  schedule: csghmc.py:64-72, :89-93, :106-111. cSGLD = alpha 1: csgld.py:21-29.

Each draw is a whole compiled epoch (lax.scan over batches); multiple chains
advance under one vmap. All continuous hyperparameters flow through the
traced ``hyp`` dict, so ``update_hyp`` (and therefore every hyperopt
iteration) reuses the compiled epoch program — zero recompiles per sweep.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.sgmcmc import sghmc_update
from ..util import tree_stack, tree_zeros_like
from .base import _Inference
from .engine import TrainState, make_epoch_fn
from .ensemble import Ensemble


def cosine_annealing_lr(lr0: float, eta_min: float, t_max: int):
    """torch CosineAnnealingLR closed form for monotone epoch stepping
    (non-traced variant, used by schedule tests)."""

    def lr_fn(epoch, batch_idx, step):
        del batch_idx, step
        return eta_min + (lr0 - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * epoch / t_max)
        )

    return lr_fn


def _cosine_hyp_lr(hyp, epoch, batch_idx, step):
    """Cosine annealing reading (lr0, eta_min, t_max) from traced hyp."""
    del batch_idx, step
    return hyp["eta_min"] + (hyp["lr0"] - hyp["eta_min"]) * 0.5 * (
        1.0 + jnp.cos(jnp.pi * epoch / hyp["t_max"])
    )


def _cyclic_hyp_lr(hyp, epoch, batch_idx, step):
    """cSGHMC per-batch cyclic cosine (csghmc.py:64-72) reading
    (lr0, num_batch, cycle_iters) from traced hyp."""
    del step
    rcounter = epoch * hyp["num_batch"] + batch_idx
    cos_inner = jnp.pi * (rcounter % hyp["cycle_iters"]) / hyp["cycle_iters"]
    return 0.5 * (jnp.cos(cos_inner) + 1.0) * hyp["lr0"]


def _sghmc_hyp_update(params, mom, grads, hyp, *, lr, noise_on, is_first_step,
                      key):
    return sghmc_update(
        params, mom, grads, lr=lr, momentum=hyp["momentum"],
        wd_over_n=hyp["wd_over_n"], n_train=hyp["n_train"],
        noise_on=noise_on, is_first_step=is_first_step, key=key,
    )


class SGHMC(_Inference):
    _DEFAULT_HYP = {
        "lr": 0.001, "prior_std": 10, "num_samples": 2, "alpha": 0.1,
        "burn_in_epochs": 10,
    }
    _FORCE_ALPHA: Optional[float] = None  # SGLD pins this to 1.0
    _ETA_MIN_FRACTION_INIT = 0.0  # ctor uses torch default eta_min=0 (sghmc.py:44)
    _ETA_MIN_FRACTION_UPDATE = 0.5  # update_hyp sets eta_min=lr/2 (sghmc.py:61-63)
    # the traced-hyp epoch contract, reused by the vectorized config sweep
    _LR_FN = staticmethod(_cosine_hyp_lr)
    _UPDATE_FN = staticmethod(_sghmc_hyp_update)

    def __init__(self, hyperparameters, model=None, train=None,
                 model_loss="multi_class_linear_output", key=None, chains=1,
                 mesh=None, chain_strategy="auto"):
        super().__init__(hyperparameters, model, train, model_loss, key, chains,
                         mesh, chain_strategy)
        if hyperparameters is None:
            hyperparameters = dict(self._DEFAULT_HYP)
        self._epoch_fn = None
        self._setup(hyperparameters, eta_min_fraction=self._ETA_MIN_FRACTION_INIT)

    # -- configuration ---------------------------------------------------------

    def _setup(self, hyp: dict, eta_min_fraction: float):
        self.hyperparameters = hyp
        self.lr = float(hyp["lr"])
        self.prior_std = float(hyp["prior_std"])
        self.num_samples = int(hyp["num_samples"])
        self.alpha = (
            self._FORCE_ALPHA if self._FORCE_ALPHA is not None
            else float(hyp.get("alpha", 0.1))
        )
        self.burn_in_epochs = int(hyp["burn_in_epochs"])
        self.momentum = 1.0 - self.alpha
        self.wd = 1.0 / (self.prior_std ** 2)
        self.n_train = self.train.n
        self.burnt_in = False
        self.epochs_run = 0

        t_max = max(self.burn_in_epochs + self.num_samples, 1)
        self._hyp_scalars = {
            "lr0": jnp.float32(self.lr),
            "eta_min": jnp.float32(eta_min_fraction * self.lr),
            "t_max": jnp.float32(t_max),
            "momentum": jnp.float32(self.momentum),
            "wd_over_n": jnp.float32(self.wd / self.n_train),
            "n_train": jnp.float32(self.n_train),
        }
        if self._epoch_fn is None:
            self._epoch_fn = make_epoch_fn(
                self.module, self.train, lr_fn=_cosine_hyp_lr,
                update_fn=_sghmc_hyp_update, chains=self.chains,
                mesh=self.mesh, chain_strategy=self.chain_strategy,
            )
        self._state = self._init_state()

    def _init_state(self) -> TrainState:
        def one(key):
            k_init, k_run = jax.random.split(key)
            variables = self.fresh_variables(k_init)
            params = variables["params"]
            return TrainState(
                params=params,
                momentum=tree_zeros_like(params),
                batch_stats=variables.get("batch_stats", {}),
                key=k_run,
                step=jnp.zeros((), jnp.int32),
            )

        if self.chains == 1:
            return one(self.next_key())
        keys = jax.random.split(self.next_key(), self.chains)
        return self.shard_chain_state(jax.vmap(one)(keys))

    def update_hyp(self, hyperparameters: dict):
        """Reset weights + optimizer state and adopt new hypers
        (sghmc.py:50-63). Reuses the compiled epoch program."""
        self._setup(hyperparameters, eta_min_fraction=self._ETA_MIN_FRACTION_UPDATE)

    # -- sampling ----------------------------------------------------------------

    def _run_epoch(self, noise_on: bool):
        self._state, loss = self._epoch_fn(
            self._state,
            jnp.asarray(self.epochs_run, jnp.float32),
            jnp.asarray(1.0 if noise_on else 0.0, jnp.float32),
            self._hyp_scalars,
        )
        self.epochs_run += 1
        self._maybe_checkpoint()
        return loss

    def _harvest(self):
        # copy: the live state buffers are donated back to the next epoch call
        copy = lambda t: jax.tree.map(lambda x: x.copy(), t)
        return copy(self._state.params), copy(self._state.batch_stats)

    def sample_iterative(self, val_loader=None, debug_val_loss=False):
        epochs = self.burn_in_epochs + 1 if not self.burnt_in else 1
        self.burnt_in = True
        for _ in range(epochs):
            loss = self._run_epoch(noise_on=True)
            if debug_val_loss and val_loader is not None:
                print({
                    "train_loss": float(jnp.mean(loss)),
                    "val_loss": self.compute_val_loss(
                        val_loader, *self._single_member()),
                })
        return self._harvest()

    def _single_member(self):
        p, b = self._harvest()
        if self.chains > 1:
            p = jax.tree.map(lambda x: x[0], p)
            b = jax.tree.map(lambda x: x[0], b)
        return p, b

    def sample(self, num_samples=None, val_loader=None, debug_val_loss=False) -> Ensemble:
        if num_samples is None:
            num_samples = self.num_samples
        draws = [
            self.sample_iterative(val_loader=val_loader, debug_val_loss=debug_val_loss)
            for _ in range(num_samples)
        ]
        return self._ensemble_from_draws(draws)

    def _ensemble_from_draws(self, draws) -> Ensemble:
        params = tree_stack([d[0] for d in draws])
        bstats = tree_stack([d[1] for d in draws])
        if self.chains > 1:
            # (S, chains, ...) -> (S*chains, ...)
            merge = lambda x: x.reshape((-1,) + x.shape[2:])
            params = jax.tree.map(merge, params)
            bstats = jax.tree.map(merge, bstats)
        n = len(draws) * self.chains
        has_bn = bool(jax.tree.leaves(bstats))
        return Ensemble(self.module, params, bstats if has_bn else None, n)


class SGLD(SGHMC):
    """SGHMC with momentum pinned to 0 (sgld.py:8-35)."""

    _FORCE_ALPHA = 1.0
    _DEFAULT_HYP = {
        "lr": 0.001, "prior_std": 10, "num_samples": 2, "burn_in_epochs": 10,
    }


class cSGHMC(_Inference):
    _DEFAULT_HYP = {
        "lr_0": 0.001, "prior_std": 10.1, "num_samples_per_cycle": 5,
        "cycle_length": 20, "burn_in_epochs": 5, "num_cycles": 10, "alpha": 1.0,
    }
    _FORCE_ALPHA: Optional[float] = None
    _LR_FN = staticmethod(_cyclic_hyp_lr)
    _UPDATE_FN = staticmethod(_sghmc_hyp_update)

    def __init__(self, hyperparameters, model=None, train=None,
                 model_loss="multi_class_linear_output", key=None, chains=1,
                 mesh=None, chain_strategy="auto"):
        super().__init__(hyperparameters, model, train, model_loss, key, chains,
                         mesh, chain_strategy)
        if hyperparameters is None:
            hyperparameters = dict(self._DEFAULT_HYP)
        self._epoch_fn = None
        self._setup(hyperparameters)

    def _setup(self, hyp: dict):
        self.hyperparameters = hyp
        self.lr_0 = float(hyp["lr_0"])
        self.prior_std = float(hyp["prior_std"])
        self.num_samples_per_cycle = int(hyp["num_samples_per_cycle"])
        self.cycle_length = int(hyp["cycle_length"])
        self.alpha = (
            self._FORCE_ALPHA if self._FORCE_ALPHA is not None
            else float(hyp.get("alpha", 1.0))
        )
        self.burn_in_epochs = int(hyp["burn_in_epochs"])
        self.num_cycles = int(hyp["num_cycles"])
        assert (self.cycle_length - self.burn_in_epochs - self.num_samples_per_cycle) > 0
        self.momentum = 1.0 - self.alpha
        self.wd = 1.0 / (self.prior_std ** 2)
        self.n_train = self.train.n
        self.epochs_run = 0
        self.burnt_in = False

        # cyclic cosine LR, float batch-count semantics of csghmc.py:29-31,64-72
        num_batch = max(1.0, self.n_train / self.train.batch_size + 1.0)
        total_epochs = self.cycle_length * self.num_cycles
        total_iterations = total_epochs * num_batch
        cycle_iters = total_iterations // self.num_cycles
        self._hyp_scalars = {
            "lr0": jnp.float32(self.lr_0),
            "num_batch": jnp.float32(num_batch),
            "cycle_iters": jnp.float32(cycle_iters),
            "momentum": jnp.float32(self.momentum),
            "wd_over_n": jnp.float32(self.wd / self.n_train),
            "n_train": jnp.float32(self.n_train),
        }
        if self._epoch_fn is None:
            self._epoch_fn = make_epoch_fn(
                self.module, self.train, lr_fn=_cyclic_hyp_lr,
                update_fn=_sghmc_hyp_update, chains=self.chains,
                mesh=self.mesh, chain_strategy=self.chain_strategy,
            )
        self._state = SGHMC._init_state(self)

    def update_hyp(self, hyperparameters: dict):
        self._setup(hyperparameters)

    def _noise_on(self) -> bool:
        # csghmc.py:89-93
        return (self.epochs_run % self.cycle_length) + 1 > (
            self.cycle_length - self.burn_in_epochs - self.num_samples_per_cycle
        )

    def _harvested(self) -> bool:
        # csghmc.py:106 (checked after the epoch counter increments)
        return ((self.epochs_run - 1) % self.cycle_length) >= (
            self.cycle_length - self.num_samples_per_cycle
        )

    def sample_iterative(self, val_loader=None, debug_val_loss=False):
        while True:
            noise = self._noise_on()
            self._state, loss = self._epoch_fn(
                self._state,
                jnp.asarray(self.epochs_run, jnp.float32),
                jnp.asarray(1.0 if noise else 0.0, jnp.float32),
                self._hyp_scalars,
            )
            self.epochs_run += 1
            self._maybe_checkpoint()
            if debug_val_loss and val_loader is not None:
                print({
                    "train_loss": float(jnp.mean(loss)),
                    "val_loss": self.compute_val_loss(
                        val_loader, *SGHMC._single_member(self)),
                })
            if self._harvested():
                return SGHMC._harvest(self)

    def sample(self, num_samples=None, val_loader=None, debug_val_loss=False) -> Ensemble:
        if num_samples is None:
            num_samples = self.num_samples_per_cycle * self.num_cycles
        draws = [
            self.sample_iterative(val_loader=val_loader, debug_val_loss=debug_val_loss)
            for _ in range(num_samples)
        ]
        return SGHMC._ensemble_from_draws(self, draws)


class cSGLD(cSGHMC):
    """cSGHMC with momentum pinned to 0 (csgld.py:9-36)."""

    _FORCE_ALPHA = 1.0
