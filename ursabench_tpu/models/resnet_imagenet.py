"""ImageNet-style ResNet adapted for 32x32 inputs (INResNet18..152) + the
MC-dropout twin.

Parity target: /root/reference/URSABench/models/imagenet_resnet.py:16-181 —
3x3 stride-1 stem (CIFAR-adapted), BasicBlock/Bottleneck with BN'd 1x1
shortcut, kaiming-normal init, final 4x4 avg pool.
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data.transforms import (CIFAR_TEST, CIFAR_TRAIN, IMAGENET_TEST,
                               IMAGENET_TRAIN)
from ..nn.init import (fan_out_normal_init, kaiming_normal_init,
                       torch_linear_bias_init, torch_linear_kernel_init)
from .common import ModelCfg, register


def _bn(train: bool, dtype=None) -> nn.BatchNorm:
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype)


def _conv(features: int, kernel: int, stride: int = 1, dtype=None,
          init=kaiming_normal_init) -> nn.Conv:
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=kernel // 2, use_bias=False, kernel_init=init,
        dtype=dtype,
    )


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: object = None
    conv_init: object = kaiming_normal_init

    @nn.compact
    def __call__(self, x, train: bool = False):
        d, ki = self.dtype, self.conv_init
        in_planes = x.shape[-1]
        out = nn.relu(_bn(train, d)(_conv(self.planes, 3, self.stride, d, ki)(x)))
        out = _bn(train, d)(_conv(self.planes, 3, dtype=d, init=ki)(out))
        shortcut = x
        if self.stride != 1 or in_planes != self.planes:
            shortcut = _bn(train, d)(_conv(self.planes, 1, self.stride, d, ki)(x))
        return nn.relu(out + shortcut)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dtype: object = None
    conv_init: object = kaiming_normal_init

    @nn.compact
    def __call__(self, x, train: bool = False):
        d, ki = self.dtype, self.conv_init
        in_planes = x.shape[-1]
        expansion = 4
        out = nn.relu(_bn(train, d)(_conv(self.planes, 1, dtype=d, init=ki)(x)))
        out = nn.relu(_bn(train, d)(_conv(self.planes, 3, self.stride, d, ki)(out)))
        out = _bn(train, d)(_conv(self.planes * expansion, 1, dtype=d, init=ki)(out))
        shortcut = x
        if self.stride != 1 or in_planes != self.planes * expansion:
            shortcut = _bn(train, d)(
                _conv(self.planes * expansion, 1, self.stride, d, ki)(x)
            )
        return nn.relu(out + shortcut)


class INResNet(nn.Module):
    layers: Sequence[int]
    bottleneck: bool = False
    num_classes: int = 10
    dropout: float = 0.0  # final-layer MC dropout (twin only)
    dtype: object = None  # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        block = Bottleneck if self.bottleneck else BasicBlock
        expansion = 4 if self.bottleneck else 1
        out = nn.relu(_bn(train, d)(_conv(64, 3, dtype=d)(x)))
        for planes, n, stride in zip((64, 128, 256, 512), self.layers, (1, 2, 2, 2)):
            for i in range(n):
                out = block(planes, stride if i == 0 else 1, d)(out, train)
        out = jnp.mean(out.astype(jnp.float32), axis=(1, 2))
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=False)(out)
        return nn.Dense(
            self.num_classes, kernel_init=kaiming_normal_init,
            bias_init=torch_linear_bias_init(512 * expansion),
        )(out)


class _SpaceToDepthStem(nn.Module):
    """The 7x7/2 pad-3 stem conv computed on 2x2 space-to-depth input —
    mathematically exact and measured 1.32x (fwd) / 1.19x (wgrad) on v5e
    (assets/rn50_conv_lowering_probe.json): Cin=3 wastes the MXU's
    128-lane contraction dim, Cin=12 with a 4x4 kernel wastes 4x less.

    Derivation (benchmarks/rn50_conv_lowering_probe.stem_s2d): writing the
    7x7 tap offset u-3 = 2t+r (r in {0,1}) maps the stride-2 conv to a
    stride-1 4x4 conv over (H/2, W/2, 4C) with padding (2,1) and kernel
    w4[k, r-channel] = w[2k+r-1] — i.e. the original kernel zero-padded at
    the FRONT of each spatial dim and reshaped. The parameter keeps the
    torchvision (7,7,C,F) shape, so init, checkpoints, and param counts
    are unchanged."""

    features: int = 64
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("kernel", fan_out_normal_init,
                       (7, 7, c, self.features))
        x, w = nn.dtypes.promote_dtype(x, w, dtype=self.dtype)
        n, h, ww, _ = x.shape
        if h % 2 or ww % 2:  # odd input: fall back to the direct form
            return jax.lax.conv_general_dilated(
                x, w, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        xs = x.reshape(n, h // 2, 2, ww // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, ww // 2,
                                                    4 * c)
        w8 = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
        w4 = w8.reshape(4, 2, 4, 2, c, self.features)
        w4 = w4.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c,
                                                    self.features)
        return jax.lax.conv_general_dilated(
            xs, w4, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class TVResNet(nn.Module):
    """True ImageNet-stem ResNet — the torchvision architecture the
    reference's trtprof engine path loads for its 224^2 rn50 ensembles
    (/root/reference/URSABench/trtprof/to_onnx.py:37 `torchvision.models.
    resnet50()`), which the reference's own CIFAR-adapted registry family
    (imagenet_resnet.py:77 3x3/1 stem) does NOT provide: 7x7/2 stem +
    3x3/2 max-pool (16x fewer stage-1 pixels at 224^2), global average
    pool, torchvision init conventions (convs kaiming-normal fan_out,
    fc torch-Linear default). The stem is computed in space-to-depth form
    by default (exact; see _SpaceToDepthStem)."""

    layers: Sequence[int]
    bottleneck: bool = False
    num_classes: int = 1000
    dropout: float = 0.0  # final-layer MC dropout (twin only)
    dtype: object = None  # compute dtype; params stay f32
    stem_s2d: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        block = Bottleneck if self.bottleneck else BasicBlock
        expansion = 4 if self.bottleneck else 1
        if self.stem_s2d:
            stem = _SpaceToDepthStem(64, dtype=d, name="Conv_0")(x)
        else:
            stem = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                           use_bias=False, kernel_init=fan_out_normal_init,
                           dtype=d, name="Conv_0")(x)
        out = nn.relu(_bn(train, d)(stem))
        out = nn.max_pool(out, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for planes, n, stride in zip((64, 128, 256, 512), self.layers, (1, 2, 2, 2)):
            for i in range(n):
                out = block(planes, stride if i == 0 else 1, d,
                            conv_init=fan_out_normal_init)(out, train)
        out = jnp.mean(out.astype(jnp.float32), axis=(1, 2))
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=False)(out)
        return nn.Dense(
            self.num_classes, kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(512 * expansion),
        )(out)


def _cfg(name: str, layers, bottleneck: bool, dropout: float = 0.0) -> ModelCfg:
    return register(
        ModelCfg(
            name=name,
            make=lambda num_classes, **kw: INResNet(num_classes=num_classes, **kw),
            transform_train=CIFAR_TRAIN,
            transform_test=CIFAR_TEST,
            kwargs={"layers": layers, "bottleneck": bottleneck,
                    **({"dropout": dropout} if dropout else {})},
        )
    )


INResNet18 = _cfg("INResNet18", (2, 2, 2, 2), False)
INResNet34 = _cfg("INResNet34", (3, 4, 6, 3), False)
INResNet50 = _cfg("INResNet50", (3, 4, 6, 3), True)
# alias used by the tuned-hyperparameter library group names (ResNet50*)
ResNet50 = _cfg("ResNet50", (3, 4, 6, 3), True)
INResNet101 = _cfg("INResNet101", (3, 4, 23, 3), True)
INResNet152 = _cfg("INResNet152", (3, 8, 36, 3), True)
INResNet50_dropout = _cfg("INResNet50_dropout", (3, 4, 6, 3), True, dropout=0.2)
ResNet_dropout = _cfg("ResNet_dropout", (3, 4, 6, 3), True, dropout=0.2)


def _tv_cfg(name: str, layers, bottleneck: bool, dropout: float = 0.0) -> ModelCfg:
    return register(
        ModelCfg(
            name=name,
            make=lambda num_classes, **kw: TVResNet(num_classes=num_classes, **kw),
            transform_train=IMAGENET_TRAIN,
            transform_test=IMAGENET_TEST,
            kwargs={"layers": layers, "bottleneck": bottleneck,
                    **({"dropout": dropout} if dropout else {})},
        )
    )


TVResNet18 = _tv_cfg("TVResNet18", (2, 2, 2, 2), False)
TVResNet50 = _tv_cfg("TVResNet50", (3, 4, 6, 3), True)
TVResNet50_dropout = _tv_cfg("TVResNet50_dropout", (3, 4, 6, 3), True, dropout=0.2)
