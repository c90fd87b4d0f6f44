"""SGD (MAP baseline) and MCdropout samplers.

Parity targets:
- SGD: /root/reference/URSABench/inference/sgd.py — plain SGD+momentum+wd,
  cosine annealing stepped per epoch, num_samples forced to 1 (:36), zero
  extra epochs after burn-in (:75).
- MCdropout: /root/reference/URSABench/inference/vi_dropout.py — swaps in
  the `<Model>_dropout` twin (:13-22), SGD with dropout-lengthscale weight
  decay l^2(1-p)/(2N) (:55), OneCycleLR stepped per *batch* (:64-66,106);
  each "sample" is the same stochastic model — here one shared parameter
  set plus per-member dropout PRNG keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.sgmcmc import sgd_momentum_update
from .base import _Inference
from .engine import make_epoch_fn
from .ensemble import Ensemble


def _sgd_hyp_update(params, mom, grads, hyp, *, lr, noise_on, is_first_step,
                    key):
    del noise_on, key
    return sgd_momentum_update(
        params, mom, grads, lr=lr, momentum=hyp["momentum"],
        weight_decay=hyp["weight_decay"], is_first_step=is_first_step,
    )


def _cosine_hyp_lr(hyp, epoch, batch_idx, step):
    del batch_idx, step
    import jax.numpy as jnp

    return hyp["eta_min"] + (hyp["lr0"] - hyp["eta_min"]) * 0.5 * (
        1.0 + jnp.cos(jnp.pi * epoch / hyp["t_max"])
    )


def _one_cycle_hyp_lr(hyp, epoch, batch_idx, step):
    """torch OneCycleLR (cos anneal) reading traced scalars from hyp."""
    del epoch, batch_idx
    import jax.numpy as jnp

    s = jnp.minimum(step.astype(jnp.float32), hyp["total_steps"])
    t_up = jnp.clip(s / hyp["up_steps"], 0.0, 1.0)
    lr_up = hyp["initial_lr"] + (hyp["max_lr"] - hyp["initial_lr"]) * 0.5 * (
        1.0 - jnp.cos(jnp.pi * t_up)
    )
    t_down = jnp.clip((s - hyp["up_steps"]) / hyp["down_steps"], 0.0, 1.0)
    lr_down = hyp["min_lr"] + (hyp["max_lr"] - hyp["min_lr"]) * 0.5 * (
        1.0 + jnp.cos(jnp.pi * t_down)
    )
    return jnp.where(s <= hyp["up_steps"], lr_up, lr_down)


def one_cycle_lr(max_lr: float, total_steps: int, pct_start: float = 0.3,
                 div_factor: float = 25.0, final_div_factor: float = 1e4):
    """torch OneCycleLR (cos anneal) closed form over the global step."""
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    # torch OneCycleLR: peak at step int(pct*total)-1, floor at total-1
    up_steps = float(max(1, int(pct_start * total_steps) - 1))
    down_steps = float(max(1, (total_steps - 1) - int(up_steps)))

    def lr_fn(epoch, batch_idx, step):
        del epoch, batch_idx
        s = jnp.minimum(step.astype(jnp.float32), float(total_steps))
        t_up = jnp.clip(s / up_steps, 0.0, 1.0)
        lr_up = initial_lr + (max_lr - initial_lr) * 0.5 * (
            1.0 - jnp.cos(jnp.pi * t_up)
        )
        t_down = jnp.clip((s - up_steps) / down_steps, 0.0, 1.0)
        lr_down = min_lr + (max_lr - min_lr) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * t_down)
        )
        return jnp.where(s <= up_steps, lr_up, lr_down)

    return lr_fn


class SGD(_Inference):
    _DEFAULT_HYP = {"lr": 0.1, "epochs": 10, "momentum": 0.9, "weight_decay": 0.001}
    _LR_FN = staticmethod(_cosine_hyp_lr)
    _UPDATE_FN = staticmethod(_sgd_hyp_update)

    def __init__(self, hyperparameters, model=None, train=None,
                 model_loss="multi_class_linear_output", key=None, chains=1,
                 mesh=None, chain_strategy="auto"):
        super().__init__(hyperparameters, model, train, model_loss, key, chains,
                         mesh, chain_strategy)
        if hyperparameters is None:
            hyperparameters = dict(self._DEFAULT_HYP)
        self._setup(hyperparameters, eta_min_fraction=0.01)

    def _setup(self, hyp, eta_min_fraction):
        self.hyperparameters = hyp
        self.lr = float(hyp["lr"])
        self.num_samples = 1  # sgd.py:36
        self.burn_in_epochs = int(hyp["epochs"])
        self.momentum = float(hyp["momentum"])
        self.weight_decay = float(hyp["weight_decay"])
        self.burnt_in = False
        self.epochs_run = 0
        t_max = max(self.burn_in_epochs + self.num_samples, 1)
        self._hyp_scalars = {
            "lr0": jnp.float32(self.lr),
            "eta_min": jnp.float32(eta_min_fraction * self.lr),
            "t_max": jnp.float32(t_max),
            "momentum": jnp.float32(self.momentum),
            "weight_decay": jnp.float32(self.weight_decay),
        }
        if getattr(self, "_epoch_fn", None) is None:
            self._epoch_fn = make_epoch_fn(
                self.module, self.train, lr_fn=_cosine_hyp_lr,
                update_fn=_sgd_hyp_update, chains=self.chains,
                mesh=self.mesh, chain_strategy=self.chain_strategy,
            )
        from .sgmcmc import SGHMC

        self._state = SGHMC._init_state(self)

    def update_hyp(self, hyperparameters):
        self._setup(hyperparameters, eta_min_fraction=0.5)

    def sample_iterative(self, val_loader=None, debug_val_loss=False):
        from .sgmcmc import SGHMC

        epochs = self.burn_in_epochs + 1 if not self.burnt_in else 0  # sgd.py:75
        self.burnt_in = True
        for _ in range(epochs):
            self._state, _ = self._epoch_fn(
                self._state, jnp.asarray(self.epochs_run, jnp.float32),
                jnp.asarray(0.0), self._hyp_scalars,
            )
            self.epochs_run += 1
        return SGHMC._harvest(self)

    def sample(self, num_samples=None, val_loader=None, debug_val_loss=False) -> Ensemble:
        from .sgmcmc import SGHMC

        if num_samples is None:
            num_samples = self.num_samples
        draws = [self.sample_iterative() for _ in range(num_samples)]
        return SGHMC._ensemble_from_draws(self, draws)


class DeepEnsemble(SGD):
    """Deep ensemble of independently-initialized MAP models (BASELINE.md
    config 3). TPU-native construction: ensemble members ARE parallel
    chains — K independent SGD trainings advance in one vmapped (optionally
    mesh-sharded) epoch program; ``sample()`` yields the K-member Ensemble.

    hyp adds 'num_members' (default 5); other keys as SGD.
    """

    def __init__(self, hyperparameters, model=None, train=None,
                 model_loss="multi_class_linear_output", key=None, chains=None,
                 mesh=None, chain_strategy="auto"):
        hyperparameters = dict(hyperparameters or
                               {**SGD._DEFAULT_HYP, "num_members": 5})
        members = int(hyperparameters.get("num_members", 5))
        super().__init__(hyperparameters, model=model, train=train,
                         model_loss=model_loss, key=key,
                         chains=chains or members, mesh=mesh,
                         chain_strategy=chain_strategy)

    def sample(self, num_samples=None, val_loader=None, debug_val_loss=False) -> Ensemble:
        del num_samples  # one draw per member; members = chains
        return super().sample(num_samples=1)


class MCdropout(_Inference):
    _DEFAULT_HYP = {
        "lr": 0.1, "epochs": 10, "dropout": 0.2, "lengthscale": 0.01,
        "num_samples": 10, "momentum": 0.9, "weight_decay": 0,
    }

    def __init__(self, hyperparameters, model=None, train=None,
                 model_loss="multi_class_linear_output", key=None, chains=1,
                 mesh=None, model_name: str | None = None,
                 chain_strategy="auto"):
        """``model`` may be a base module; pass ``model_name`` to resolve the
        `_dropout` twin from the registry (vi_dropout.py:13-22), or pass the
        dropout module directly."""
        if model_name is not None:
            from .. import models as model_zoo

            cfg = model_zoo.dropout_twin(model_name)
            num_classes = getattr(model, "num_classes", None) or 10
            model = cfg.build(num_classes)
        super().__init__(hyperparameters, model, train, model_loss, key, chains,
                         mesh, chain_strategy)
        if hyperparameters is None:
            hyperparameters = dict(self._DEFAULT_HYP)
        self._setup(hyperparameters)

    def _setup(self, hyp):
        self.hyperparameters = hyp
        self.lr = float(hyp["lr"])
        self.num_samples = int(hyp["num_samples"])
        self.burn_in_epochs = int(hyp["epochs"])
        self.dropout = float(hyp["dropout"])
        self.momentum = float(hyp["momentum"])
        if float(hyp.get("weight_decay", 0)) != 0:
            self.weight_decay = float(hyp["weight_decay"])
        else:
            # dropout-lengthscale decay (vi_dropout.py:55)
            self.weight_decay = (
                float(hyp["lengthscale"]) ** 2 * (1 - self.dropout)
                / (2.0 * self.train.n)
            )
        self.burnt_in = False
        self.epochs_run = 0
        total_steps = max(
            (self.burn_in_epochs + self.num_samples) * self.train.num_batches, 2
        )
        max_lr = self.lr * 5
        initial_lr = max_lr / 25.0
        up_steps = float(max(1, int(0.3 * total_steps) - 1))
        self._hyp_scalars = {
            "max_lr": jnp.float32(max_lr),
            "initial_lr": jnp.float32(initial_lr),
            "min_lr": jnp.float32(initial_lr / 1e4),
            "total_steps": jnp.float32(total_steps),
            "up_steps": jnp.float32(up_steps),
            "down_steps": jnp.float32(max(1.0, (total_steps - 1) - up_steps)),
            "momentum": jnp.float32(self.momentum),
            "weight_decay": jnp.float32(self.weight_decay),
        }
        if getattr(self, "_epoch_fn", None) is None:
            self._epoch_fn = make_epoch_fn(
                self.module, self.train, lr_fn=_one_cycle_hyp_lr,
                update_fn=_sgd_hyp_update, chains=self.chains,
                mesh=self.mesh, chain_strategy=self.chain_strategy,
            )
        from .sgmcmc import SGHMC

        self._state = SGHMC._init_state(self)

    def update_hyp(self, hyperparameters):
        self._setup(hyperparameters)

    def sample_iterative(self, val_loader=None, debug_val_loss=False):
        from .sgmcmc import SGHMC

        epochs = self.burn_in_epochs + 1 if not self.burnt_in else 1
        self.burnt_in = True
        for _ in range(epochs):
            self._state, _ = self._epoch_fn(
                self._state, jnp.asarray(self.epochs_run, jnp.float32),
                jnp.asarray(0.0), self._hyp_scalars,
            )
            self.epochs_run += 1
        return SGHMC._harvest(self)

    def sample(self, num_samples=None, val_loader=None, debug_val_loss=False) -> Ensemble:
        if num_samples is None:
            num_samples = self.num_samples
        params, bstats = None, None
        for _ in range(num_samples):
            params, bstats = self.sample_iterative()
        # one shared weight set; members differ only by dropout PRNG stream
        if self.chains > 1:
            params = jax.tree.map(lambda x: x[0], params)
            bstats = jax.tree.map(lambda x: x[0], bstats)
        stack = lambda t: jax.tree.map(
            lambda x: jnp.broadcast_to(x, (num_samples,) + x.shape), t
        )
        has_bn = bool(jax.tree.leaves(bstats))
        return Ensemble(
            self.module, stack(params), stack(bstats) if has_bn else None,
            num_samples,
            dropout_keys=jax.random.split(self.next_key(), num_samples),
        )
