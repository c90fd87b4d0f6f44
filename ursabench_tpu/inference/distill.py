"""Posterior distillation: compress a sampled ensemble into the
(prediction model, expected-data-uncertainty model) pair that the
PredictionDistilled / OODDetectionDistilled tasks consume.

The reference ships the distilled *evaluation* tasks
(/root/reference/URSABench/tasks/prediction_distilled.py) but no trainer —
distilled models arrive from elsewhere. This completes the loop: member 0
learns the BMA class probabilities (soft-target cross-entropy) and member 1
regresses the log expected data entropy (matching the ``.exp()`` read-out
at prediction_distilled.py:58), each trained with Adam over jitted epochs
on the ensemble's own train-set predictions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..data.arrays import DataSplit
from ..data.transforms import normalize
from ..tasks.base import accumulate_split
from ..tasks.distilled import DistilledPair
from .engine import init_variables
from .ensemble import Ensemble


def _train_regressor(module, split: DataSplit, targets, loss_kind: str,
                     epochs: int, lr: float, key: jax.Array):
    images, _ = split.device_arrays()
    spec = split.spec
    n = split.n
    bsz = min(split.batch_size, n)
    nb = max(1, n // bsz)  # drop ragged tail; never zero training steps
    variables = init_variables(module, key, spec.shape)
    params = variables["params"]
    has_bn = bool(variables.get("batch_stats"))
    bstats = variables.get("batch_stats", {})
    opt = optax.adam(lr)

    def loss_fn(params, bstats, x, t):
        out, mutated = module.apply(
            {"params": params, **({"batch_stats": bstats} if has_bn else {})},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        if loss_kind == "soft_ce":
            logp = jax.nn.log_softmax(out, axis=-1)
            loss = -jnp.mean(jnp.sum(t * logp, axis=-1))
        else:  # mse on the raw head output
            loss = jnp.mean((out.reshape(t.shape) - t) ** 2)
        return loss, mutated.get("batch_stats", {})

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    # data/targets as jit arguments (not closure constants) — see
    # engine.make_epoch_fn
    @jax.jit
    def epoch_impl(params, bstats, opt_state, key, images, targets):
        key, k_perm = jax.random.split(key)
        perm = jax.random.permutation(k_perm, n)[: nb * bsz].reshape(nb, bsz)

        def body(carry, idx):
            params, bstats, opt_state = carry
            x = normalize(jnp.take(images, idx, axis=0), spec)
            t = jnp.take(targets, idx, axis=0)
            (loss, new_b), grads = grad_fn(params, bstats, x, t)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_b if new_b else bstats, opt_state), loss

        (params, bstats, opt_state), losses = jax.lax.scan(
            body, (params, bstats, opt_state), perm
        )
        return params, bstats, opt_state, key, losses.mean()

    def epoch(params, bstats, opt_state, key):
        return epoch_impl(params, bstats, opt_state, key, images, targets)

    opt_state = opt.init(params)
    for _ in range(epochs):
        params, bstats, opt_state, key, _ = epoch(params, bstats, opt_state, key)
    out = {"params": params}
    if has_bn:
        out["batch_stats"] = bstats
    return out


def distill_ensemble(
    ensemble: Ensemble,
    train_split: DataSplit,
    pred_module,
    unc_module,
    *,
    epochs: int = 20,
    lr: float = 1e-3,
    key: jax.Array | None = None,
) -> DistilledPair:
    """Distill ``ensemble`` into a DistilledPair on ``train_split``."""
    key = key if key is not None else jax.random.PRNGKey(0)
    k_pred, k_unc = jax.random.split(key)

    sum_probs, sum_ent = accumulate_split(ensemble, train_split,
                                          smooth_probs=False)
    bma_probs = jnp.asarray(sum_probs / ensemble.num_members)
    expected_ent = jnp.asarray(sum_ent / ensemble.num_members)
    log_ent = jnp.log(jnp.maximum(expected_ent, 1e-12))

    pred_vars = _train_regressor(
        pred_module, train_split, bma_probs, "soft_ce", epochs, lr, k_pred
    )
    unc_vars = _train_regressor(
        unc_module, train_split, log_ent, "mse", epochs, lr, k_unc
    )
    return DistilledPair(pred_module, pred_vars, unc_module, unc_vars)
