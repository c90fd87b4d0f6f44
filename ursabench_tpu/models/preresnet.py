"""Pre-activation ResNet (PreResNet8/56/83/110/164).

Parity target: /root/reference/URSABench/models/preresnet.py:19-151 —
BasicBlock for depth<44 ((d-2)%6==0), Bottleneck (x4 expansion) for
depth>=44 ((d-2)%9==0); conv weights N(0, sqrt(2/(k*k*cout))) (fan-out
normal, preresnet.py:114-117); 1x1 conv (no BN) downsample.
"""

import flax.linen as nn
import jax.numpy as jnp

from ..data.transforms import CIFAR_TEST, CIFAR_TRAIN
from ..nn.init import fan_out_normal_init, torch_linear_bias_init, torch_linear_kernel_init
from .common import ModelCfg, register


def _bn(train: bool, dtype=None) -> nn.BatchNorm:
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype)


def _conv(features: int, kernel: int, stride: int = 1, dtype=None) -> nn.Conv:
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=kernel // 2, use_bias=False, kernel_init=fan_out_normal_init,
        dtype=dtype,
    )


class PreBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        out = nn.relu(_bn(train, d)(x))
        residual = (
            _conv(self.planes, 1, self.stride, d)(x) if self.downsample else x
        )
        out = _conv(self.planes, 3, self.stride, d)(out)
        out = _conv(self.planes, 3, dtype=d)(nn.relu(_bn(train, d)(out)))
        return out + residual


class PreBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        out = nn.relu(_bn(train, d)(x))
        residual = (
            _conv(self.planes * 4, 1, self.stride, d)(x) if self.downsample else x
        )
        out = _conv(self.planes, 1, dtype=d)(out)
        out = _conv(self.planes, 3, self.stride, d)(nn.relu(_bn(train, d)(out)))
        out = _conv(self.planes * 4, 1, dtype=d)(nn.relu(_bn(train, d)(out)))
        return out + residual


class PreResNet(nn.Module):
    depth: int = 110
    num_classes: int = 10
    dtype: object = None  # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        if self.depth >= 44:
            assert (self.depth - 2) % 9 == 0, "depth should be 9n+2"
            n, block, expansion = (self.depth - 2) // 9, PreBottleneck, 4
        else:
            assert (self.depth - 2) % 6 == 0, "depth should be 6n+2"
            n, block, expansion = (self.depth - 2) // 6, PreBasicBlock, 1

        out = _conv(16, 3, dtype=d)(x)
        inplanes = 16
        for planes, stride in zip((16, 32, 64), (1, 2, 2)):
            for i in range(n):
                s = stride if i == 0 else 1
                down = i == 0 and (s != 1 or inplanes != planes * expansion)
                out = block(planes, s, down, d)(out, train)
                inplanes = planes * expansion
        out = nn.relu(_bn(train, d)(out))
        out = jnp.mean(out.astype(jnp.float32), axis=(1, 2))
        return nn.Dense(
            self.num_classes, kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(64 * expansion),
        )(out)


def _cfg(name: str, depth: int) -> ModelCfg:
    return register(
        ModelCfg(
            name=name,
            make=lambda num_classes, **kw: PreResNet(
                depth=kw.get("depth", depth), num_classes=num_classes,
                dtype=kw.get("dtype"),
            ),
            transform_train=CIFAR_TRAIN,
            transform_test=CIFAR_TEST,
            kwargs={"depth": depth},
        )
    )


PreResNet8 = _cfg("PreResNet8", 8)
PreResNet20 = _cfg("PreResNet20", 20)  # baseline flagship (BASELINE.md config 3)
PreResNet56 = _cfg("PreResNet56", 56)
PreResNet83 = _cfg("PreResNet83", 83)
PreResNet110 = _cfg("PreResNet110", 110)
PreResNet164 = _cfg("PreResNet164", 164)
