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

    def ensemble_update_statistics(self, model_list, *args, **kwargs):
        """Carried for protocol parity (task_base.py:16 declares it; nothing
        in the reference ever calls or implements it). Here the plural and
        singular surfaces coincide: ``update_statistics`` already consumes a
        whole stacked-pytree Ensemble — delegate, preserving each task's own
        defaults."""
        return self.update_statistics(model_list, *args, **kwargs)

    def get_performance_metrics(self):
        raise NotImplementedError


def accumulate_split(ensemble: Ensemble, split, smooth_probs: bool):
    """One pass over a DataSplit with all ensemble members vmapped — the
    ENTIRE split as a single jitted scan (one device program, one host
    transfer), replacing the reference's per-batch per-member Python loop.

    Returns (sum of per-member probs, sum of per-member entropies) as numpy,
    matching the accumulators of prediction.py:24-25 / ood_detection.py:18-21.
    ``smooth_probs`` selects whether the *accumulated probabilities* are
    centrally smoothed (OOD/Decision do: ood_detection.py:62-65; Prediction
    does not: prediction.py:60 — only the entropy input is smoothed there).
    """
    import jax

    from ..data.transforms import normalize

    # hold the split in the cache entry: id() alone could be reused after gc
    # and silently evaluate against a dead split's arrays
    key = ("accumulate", id(split), bool(smooth_probs))
    if key not in ensemble._jit_cache or ensemble._jit_cache[key][0] is not split:
        images, _ = split.device_arrays()
        spec = split.spec
        n = split.n
        bsz = split.batch_size
        nb = -(-n // bsz)
        pad = nb * bsz - n
        module = ensemble.module
        bs_axes = None if ensemble.batch_stats is None else 0
        key_axes = None if ensemble.dropout_keys is None else 0

        # data enters as a jit argument (not a closure constant) so the
        # compiled program is shape-only — see engine.make_epoch_fn
        def run(params, batch_stats, keys, images):
            idx = jnp.arange(n)
            if pad:
                idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
            batches = idx.reshape(nb, bsz)

            def member_logits(p, b, k, x, bi):
                variables = {"params": p}
                if b is not None:
                    variables["batch_stats"] = b
                rngs = None
                if k is not None:
                    rngs = {"dropout": jax.random.fold_in(k, bi)}
                return module.apply(variables, x, train=False, rngs=rngs)

            def body(carry, inp):
                acc_p, acc_e = carry
                bi, b_idx = inp
                x = normalize(jnp.take(images, b_idx, axis=0), spec)
                logits = jax.vmap(
                    lambda p, b, k: member_logits(p, b, k, x, bi),
                    in_axes=(0, bs_axes, key_axes),
                )(params, batch_stats, keys)
                # bf16-compute models emit bf16 logits; metric accumulation
                # is always f32
                probs = softmax_probs(logits.astype(jnp.float32))
                smoothed = central_smoothing(probs)
                p_sum = jnp.sum(smoothed if smooth_probs else probs, axis=0)
                e_sum = jnp.sum(predictive_entropy(smoothed), axis=0)
                acc_p = jax.lax.dynamic_update_slice(acc_p, p_sum, (bi * bsz, 0))
                acc_e = jax.lax.dynamic_update_slice(acc_e, e_sum, (bi * bsz,))
                return (acc_p, acc_e), None

            num_classes = jax.eval_shape(
                lambda p, b, k: member_logits(
                    p, b, k, jnp.zeros((1,) + spec.shape, jnp.float32), 0
                ),
                jax.tree.map(lambda a: a[0], params),
                None if batch_stats is None
                else jax.tree.map(lambda a: a[0], batch_stats),
                None if keys is None else keys[0],
            ).shape[-1]
            acc0 = (
                jnp.zeros((nb * bsz, num_classes)),
                jnp.zeros((nb * bsz,)),
            )
            (acc_p, acc_e), _ = jax.lax.scan(
                body, acc0, (jnp.arange(nb), batches)
            )
            return acc_p[:n], acc_e[:n]

        ensemble._jit_cache[key] = (split, jax.jit(run), images)
    _, fn, images = ensemble._jit_cache[key]
    acc_p, acc_e = fn(
        ensemble.params, ensemble.batch_stats, ensemble.dropout_keys, images
    )
    return np.asarray(acc_p), np.asarray(acc_e)
