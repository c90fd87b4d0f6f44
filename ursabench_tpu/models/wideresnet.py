"""WideResNet-28x10 (+ always-on-dropout twin).

Parity target: /root/reference/URSABench/models/wideresnet.py:30-183.
Convs use bias=True (wideresnet.py:17) and torch-default init; the final BN
uses torch momentum 0.9 (wideresnet.py:97) -> flax momentum 0.1. The
`_dropout` twin keeps dropout active regardless of train/eval
(wideresnet.py:69-75,163), which is what makes MCdropout sampling work.
"""

import flax.linen as nn
import jax.numpy as jnp

from ..data.transforms import CIFAR_TEST, CIFAR_TRAIN
from ..nn.init import torch_linear_bias_init, torch_linear_kernel_init
from .common import ModelCfg, register


def _conv(features: int, kernel: int, stride: int = 1, fan_in: int = 1,
          dtype=None) -> nn.Conv:
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=kernel // 2, use_bias=True,
        kernel_init=torch_linear_kernel_init,
        bias_init=torch_linear_bias_init(fan_in),
        dtype=dtype,
    )


def _bn(train: bool, momentum: float = 0.9, dtype=None) -> nn.BatchNorm:
    return nn.BatchNorm(use_running_average=not train, momentum=momentum,
                        epsilon=1e-5, dtype=dtype)


class WideBasic(nn.Module):
    planes: int
    stride: int = 1
    dropout_rate: float = 0.0
    mc_dropout: bool = False  # dropout active at eval (dropout twin)
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        in_planes = x.shape[-1]
        out = _conv(self.planes, 3, fan_in=in_planes * 9, dtype=d)(
            nn.relu(_bn(train, dtype=d)(x))
        )
        if self.dropout_rate > 0:
            out = nn.Dropout(self.dropout_rate, deterministic=not (train or self.mc_dropout))(out)
        out = _conv(self.planes, 3, self.stride, fan_in=self.planes * 9, dtype=d)(
            nn.relu(_bn(train, dtype=d)(out))
        )
        shortcut = x
        if self.stride != 1 or in_planes != self.planes:
            shortcut = _conv(self.planes, 1, self.stride, fan_in=in_planes,
                             dtype=d)(x)
        return out + shortcut


class WideResNet(nn.Module):
    depth: int = 28
    widen_factor: int = 10
    num_classes: int = 10
    dropout_rate: float = 0.0
    dropout: float = 0.0  # final-layer MC dropout (twin only)
    dtype: object = None  # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert (self.depth - 4) % 6 == 0, "Wide-resnet depth should be 6n+4"
        n = (self.depth - 4) // 6
        k = self.widen_factor
        mc = self.dropout > 0
        d = self.dtype

        out = _conv(16, 3, fan_in=3 * 9, dtype=d)(x)
        for planes, stride in zip((16 * k, 32 * k, 64 * k), (1, 2, 2)):
            for i in range(n):
                out = WideBasic(
                    planes, stride if i == 0 else 1,
                    dropout_rate=self.dropout if mc else self.dropout_rate,
                    mc_dropout=mc, dtype=d,
                )(out, train)
        out = nn.relu(_bn(train, momentum=0.1, dtype=d)(out))
        out = jnp.mean(out.astype(jnp.float32), axis=(1, 2))
        if mc:
            out = nn.Dropout(self.dropout, deterministic=False)(out)
        return nn.Dense(
            self.num_classes, kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(64 * k),
        )(out)


WideResNet28x10 = register(
    ModelCfg(
        name="WideResNet28x10",
        make=lambda num_classes, **kw: WideResNet(num_classes=num_classes, **kw),
        transform_train=CIFAR_TRAIN,
        transform_test=CIFAR_TEST,
        kwargs={"depth": 28, "widen_factor": 10},
    )
)

WideResNet28x10_dropout = register(
    ModelCfg(
        name="WideResNet28x10_dropout",
        make=lambda num_classes, **kw: WideResNet(num_classes=num_classes, **kw),
        transform_train=CIFAR_TRAIN,
        transform_test=CIFAR_TEST,
        kwargs={"depth": 28, "widen_factor": 10, "dropout": 0.1},
    )
)

# reference alias: WideResNet_dropout (wideresnet.py:122)
WideResNet_dropout = register(
    ModelCfg(
        name="WideResNet_dropout",
        make=lambda num_classes, **kw: WideResNet(num_classes=num_classes, **kw),
        transform_train=CIFAR_TRAIN,
        transform_test=CIFAR_TEST,
        kwargs={"depth": 28, "widen_factor": 10, "dropout": 0.1},
    )
)
