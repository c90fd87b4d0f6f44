"""CIFAR ResNet with option-A (parameter-free) shortcuts.

Parity target: /root/reference/URSABench/models/resnet.py:26-133 —
ResNet20/32/44/56/110/1202, kaiming-normal conv/linear init, option-A
shortcut = spatial 2x subsample + zero channel padding. NHWC layout
throughout (TPU-native), BatchNorm with torch semantics (momentum 0.1,
eps 1e-5 -> flax momentum 0.9).
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..data.transforms import CIFAR_TEST, CIFAR_TRAIN
from ..nn.init import kaiming_normal_init, torch_linear_bias_init
from .common import ModelCfg, register


def _bn(train: bool, dtype=None, **kw) -> nn.BatchNorm:
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, **kw)


def _conv(features: int, kernel: int, stride: int = 1, dtype=None) -> nn.Conv:
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=kernel // 2, use_bias=False, kernel_init=kaiming_normal_init,
        dtype=dtype,
    )


class BasicBlockA(nn.Module):
    planes: int
    stride: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        in_planes = x.shape[-1]
        out = nn.relu(_bn(train, d)(_conv(self.planes, 3, self.stride, d)(x)))
        out = _bn(train, d)(_conv(self.planes, 3, dtype=d)(out))
        shortcut = x
        if self.stride != 1 or in_planes != self.planes:
            # option A: subsample + zero-pad channels (resnet.py:42-44)
            shortcut = x[:, ::2, ::2, :]
            pad = self.planes // 4
            shortcut = jnp.pad(shortcut, ((0, 0), (0, 0), (0, 0), (pad, pad)))
        return nn.relu(out + shortcut)


class CifarResNet(nn.Module):
    num_blocks: Sequence[int]
    num_classes: int = 10
    dtype: object = None  # compute dtype (e.g. jnp.bfloat16); params stay f32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        out = nn.relu(_bn(train, d)(_conv(16, 3, dtype=d)(x)))
        for planes, n, stride in zip((16, 32, 64), self.num_blocks, (1, 2, 2)):
            strides = [stride] + [1] * (n - 1)
            for s in strides:
                out = BasicBlockA(planes, s, d)(out, train)
        out = jnp.mean(out.astype(jnp.float32), axis=(1, 2))
        return nn.Dense(
            self.num_classes, kernel_init=kaiming_normal_init,
            bias_init=torch_linear_bias_init(64),
        )(out)


def _cfg(name: str, blocks) -> ModelCfg:
    return register(
        ModelCfg(
            name=name,
            make=lambda num_classes, **kw: CifarResNet(
                num_blocks=kw.get("num_blocks", blocks), num_classes=num_classes,
                dtype=kw.get("dtype"),
            ),
            transform_train=CIFAR_TRAIN,
            transform_test=CIFAR_TEST,
            kwargs={"num_blocks": blocks},
        )
    )


ResNet20 = _cfg("ResNet20", (3, 3, 3))
ResNet32 = _cfg("ResNet32", (5, 5, 5))
ResNet44 = _cfg("ResNet44", (7, 7, 7))
ResNet56 = _cfg("ResNet56", (9, 9, 9))
ResNet110 = _cfg("ResNet110", (18, 18, 18))
ResNet1202 = _cfg("ResNet1202", (200, 200, 200))
