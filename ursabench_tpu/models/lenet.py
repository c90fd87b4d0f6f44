"""LeNet-5 for (Fashion)MNIST — small conv fixture used by the baseline
configs (BASELINE.md config 2); not present in the reference zoo, added for
benchmark coverage."""

import flax.linen as nn
import jax.numpy as jnp

from ..data.transforms import MNIST_TEST, MNIST_TRAIN
from ..nn.init import torch_linear_bias_init, torch_linear_kernel_init
from .common import ModelCfg, register


class LeNet5(nn.Module):
    num_classes: int = 10
    dtype: object = None  # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv(features, fan_in):
            return nn.Conv(
                features, (5, 5), padding="VALID",
                kernel_init=torch_linear_kernel_init,
                bias_init=torch_linear_bias_init(fan_in),
                dtype=self.dtype,
            )

        def dense(features, fan_in):
            return nn.Dense(
                features,
                kernel_init=torch_linear_kernel_init,
                bias_init=torch_linear_bias_init(fan_in),
                dtype=self.dtype,
            )

        # pad 28x28 -> 32x32 as classic LeNet expects
        x = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
        x = nn.relu(conv(6, 1 * 25)(x))
        x = nn.avg_pool(x, (2, 2), (2, 2))
        x = nn.relu(conv(16, 6 * 25)(x))
        x = nn.avg_pool(x, (2, 2), (2, 2))
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(dense(120, 400)(x))
        x = nn.relu(dense(84, 120)(x))
        return dense(self.num_classes, 84)(x)


LeNet5MNIST = register(
    ModelCfg(
        name="LeNet5MNIST",
        make=lambda num_classes, **kw: LeNet5(num_classes=num_classes, **kw),
        transform_train=MNIST_TRAIN,
        transform_test=MNIST_TEST,
    )
)
