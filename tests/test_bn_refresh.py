"""BN-buffer refresh must compute the exact batch-size-weighted average of
batch statistics, including models with per-layer BN momenta (the WRN head
uses torch momentum 0.9 where all other BNs use 0.1)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ursabench_tpu.data import DataSplit
from ursabench_tpu.data.transforms import ImageSpec, normalize
from ursabench_tpu.inference.engine import init_variables, make_bn_refresh_fn


class MixedMomentumNet(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(4, (3, 3), padding=1)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        x = nn.Conv(4, (3, 3), padding=1)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.1)(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(3)(x)


def test_refresh_exact_with_mixed_momenta():
    rng = np.random.default_rng(0)
    n, bsz = 64, 16
    images = rng.integers(0, 255, (n, 8, 8, 1), dtype=np.uint8)
    labels = rng.integers(0, 3, n)
    spec = ImageSpec(8, 1, (0.5,), (0.5,))
    split = DataSplit(images, labels, bsz, spec)

    module = MixedMomentumNet()
    variables = init_variables(module, jax.random.PRNGKey(0), (8, 8, 1))
    params = variables["params"]
    refresh = make_bn_refresh_fn(module, split)
    got = refresh(params, variables["batch_stats"])

    # reference computation: weighted average of per-batch statistics,
    # obtained by diffing two applies (old=0 vs old=1) per batch
    def batch_stats_of(x):
        zeros = jax.tree.map(jnp.zeros_like, variables["batch_stats"])
        ones = jax.tree.map(jnp.ones_like, variables["batch_stats"])

        def ta(stats):
            _, mut = module.apply(
                {"params": params, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )
            return mut["batch_stats"]

        f0, f1 = ta(zeros), ta(ones)
        m = jax.tree.map(lambda a, b: b - a, f0, f1)
        return jax.tree.map(lambda f, mm: f / (1 - mm), f0, m)

    expected = None
    count = 0.0
    for i in range(0, n, bsz):
        x = normalize(jnp.asarray(images[i:i + bsz]), spec)
        bs = batch_stats_of(x)
        if expected is None:
            expected = bs
        else:
            w = count / (count + bsz)
            expected = jax.tree.map(
                lambda o, nw: w * o + (1 - w) * nw, expected, bs
            )
        count += bsz

    for g, e in zip(jax.tree.leaves(got), jax.tree.leaves(expected)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e),
                                   rtol=1e-4, atol=1e-5)
