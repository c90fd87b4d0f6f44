"""Vectorized multi-config SG-MCMC sweeps.

The reference parallelizes hyperparameter sweeps by launching one OS
process per configuration (run_par_hypOpt.py:78-79 + subprocess command
lists). On TPU the right construct is config-as-a-batch-axis: K
configurations' sampler states advance in ONE device program — the epoch
body is vmapped over (state, lr_0, momentum, weight_decay) so XLA batches
the K model updates onto the same kernels (SURVEY.md §2.9 "config
parallelism"; BASELINE.md config 5). Constraints: all configs share the
schedule length (burn_in + num_samples) and architecture; continuous hypers
(lr, prior_std, alpha) vary freely per config.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import optax

from ..data.arrays import DataSplit
from ..data.transforms import augment_normalized, normalize
from ..ops.sgmcmc import sghmc_update
from ..util import tree_stack, tree_zeros_like
from .engine import TrainState, init_variables
from .ensemble import Ensemble


def make_sweep_epoch_fn(module, split: DataSplit, t_max: int,
                        eta_min_fraction: float = 0.0):
    """epoch_fn(states, epoch, noise_on, lr0, momentum, wd_over_n) with a
    leading K config axis on states and the hyper vectors."""
    images, labels = split.device_arrays()
    spec = split.spec
    n = split.n
    bsz = split.batch_size
    nb = -(-n // bsz)
    pad = nb * bsz - n
    n_train = float(n)

    def loss_fn(params, batch_stats, x, y, dropout_key):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        logits, mutated = module.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": dropout_key},
        )
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        return ce.mean(), mutated.get("batch_stats", {})

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def epoch_impl(state: TrainState, images, labels, epoch, noise_on, lr0,
                   momentum, wd_over_n):
        key, k_perm, k_aug, k_noise, k_drop = jax.random.split(state.key, 5)
        perm = jax.random.permutation(k_perm, n)
        if pad:
            perm = jnp.concatenate([perm, perm[:pad]])
        batch_idx = perm.reshape(nb, bsz)
        lr = (eta_min_fraction * lr0) + (lr0 - eta_min_fraction * lr0) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * epoch / t_max)
        )

        def body(carry, inp):
            params, mom, bstats, step = carry
            bi, idx = inp
            x = jnp.take(images, idx, axis=0)
            y = jnp.take(labels, idx, axis=0)
            x = normalize(x, spec)
            if spec.random_crop_pad or spec.random_flip:
                x = augment_normalized(jax.random.fold_in(k_aug, bi), x, spec)
            (loss, new_bstats), grads = grad_fn(
                params, bstats, x, y, jax.random.fold_in(k_drop, bi)
            )
            params, mom = sghmc_update(
                params, mom, grads, lr=lr, momentum=momentum,
                wd_over_n=wd_over_n, n_train=n_train, noise_on=noise_on,
                is_first_step=(step == 0), key=jax.random.fold_in(k_noise, bi),
            )
            if not new_bstats:
                new_bstats = bstats
            return (params, mom, new_bstats, step + 1), loss

        init = (state.params, state.momentum, state.batch_stats, state.step)
        (params, mom, bstats, step), losses = jax.lax.scan(
            body, init, (jnp.arange(nb), batch_idx)
        )
        return TrainState(params, mom, bstats, key, step), losses.mean()

    # data as jit arguments (not closure constants) — see engine.make_epoch_fn
    fn = jax.vmap(epoch_impl, in_axes=(0, None, None, None, None, 0, 0, 0))
    jitted = jax.jit(fn, donate_argnums=(0,))

    def epoch_fn(state, epoch, noise_on, lr0, momentum, wd_over_n):
        return jitted(state, images, labels, epoch, noise_on, lr0, momentum,
                      wd_over_n)

    return epoch_fn


class SGHMCSweep:
    """K SGHMC configurations sampled simultaneously.

    hyp_list: K dicts {'lr', 'prior_std', 'alpha', 'num_samples',
    'burn_in_epochs'} — num_samples and burn_in_epochs must agree.
    SGLD sweep = alpha 1.0 in every config.
    """

    def __init__(self, hyp_list: Sequence[dict], model=None, train=None,
                 key=None, eta_min_fraction: float = 0.0):
        assert len(hyp_list) >= 1
        self.module = model
        self.train = train
        self.hyp_list = list(hyp_list)
        self.K = len(hyp_list)
        self.num_samples = int(hyp_list[0]["num_samples"])
        self.burn_in_epochs = int(hyp_list[0]["burn_in_epochs"])
        for h in hyp_list:
            assert int(h["num_samples"]) == self.num_samples
            assert int(h["burn_in_epochs"]) == self.burn_in_epochs
        self.lr0 = jnp.asarray([float(h["lr"]) for h in hyp_list])
        self.momentum = jnp.asarray(
            [1.0 - float(h.get("alpha", 0.1)) for h in hyp_list]
        )
        self.wd_over_n = jnp.asarray(
            [1.0 / float(h["prior_std"]) ** 2 / train.n for h in hyp_list]
        )
        key = key if key is not None else jax.random.PRNGKey(0)
        t_max = max(self.burn_in_epochs + self.num_samples, 1)
        self._epoch_fn = make_sweep_epoch_fn(
            self.module, self.train, t_max, eta_min_fraction
        )

        def one(k):
            k_init, k_run = jax.random.split(k)
            variables = init_variables(self.module, k_init, train.spec.shape)
            params = variables["params"]
            return TrainState(
                params=params,
                momentum=tree_zeros_like(params),
                batch_stats=variables.get("batch_stats", {}),
                key=k_run,
                step=jnp.zeros((), jnp.int32),
            )

        self._state = jax.vmap(one)(jax.random.split(key, self.K))
        self.epochs_run = 0

    def _run_epoch(self):
        self._state, loss = self._epoch_fn(
            self._state, jnp.asarray(self.epochs_run, jnp.float32),
            jnp.asarray(1.0), self.lr0, self.momentum, self.wd_over_n,
        )
        self.epochs_run += 1
        return loss

    def sample(self) -> List[Ensemble]:
        """Runs the full SGHMC protocol for every config at once; returns a
        per-config list of Ensembles (each num_samples members)."""
        draws = []
        copy = lambda t: jax.tree.map(lambda x: x.copy(), t)
        for s in range(self.num_samples):
            epochs = self.burn_in_epochs + 1 if s == 0 else 1
            for _ in range(epochs):
                self._run_epoch()
            draws.append((copy(self._state.params), copy(self._state.batch_stats)))
        params = tree_stack([d[0] for d in draws])  # (S, K, ...)
        bstats = tree_stack([d[1] for d in draws])
        has_bn = bool(jax.tree.leaves(bstats))
        out = []
        for k in range(self.K):
            pk = jax.tree.map(lambda x: x[:, k], params)
            bk = jax.tree.map(lambda x: x[:, k], bstats) if has_bn else None
            out.append(Ensemble(self.module, pk, bk, self.num_samples))
        return out

    def objectives(self, task_factory) -> List[float]:
        """Evaluate every config's ensemble; task_factory() builds a fresh
        single-metric task (output_performance mode)."""
        ensembles = self.sample()
        objs = []
        for ens in ensembles:
            task = task_factory()
            task.reset()
            objs.append(task.update_statistics(ens, output_performance=True))
        return objs
