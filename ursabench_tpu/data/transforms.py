"""Image preprocessing specs + on-device augmentation.

Replaces the reference's per-model torchvision transform pipelines
(e.g. /root/reference/URSABench/models/resnet.py:97-109) with a declarative
spec applied *inside jit* on whole batches: normalization, random crop with
padding, horizontal flip. All ops are vectorized NHWC tensor ops, so they fuse
into the training step and never touch the host.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class ImageSpec:
    size: int
    channels: int
    mean: Tuple[float, ...]
    std: Tuple[float, ...]
    random_crop_pad: int = 0
    random_flip: bool = False

    @property
    def shape(self):
        return (self.size, self.size, self.channels)


MNIST_TRAIN = ImageSpec(28, 1, (0.1307,), (0.3081,))
MNIST_TEST = MNIST_TRAIN

CIFAR_MEAN = (0.4914, 0.4822, 0.4465)
CIFAR_STD = (0.2023, 0.1994, 0.2010)
CIFAR_TRAIN = ImageSpec(32, 3, CIFAR_MEAN, CIFAR_STD, random_crop_pad=4, random_flip=True)
CIFAR_TEST = ImageSpec(32, 3, CIFAR_MEAN, CIFAR_STD)


def normalize(images: jnp.ndarray, spec: ImageSpec) -> jnp.ndarray:
    """uint8 NHWC -> normalized float32 NHWC ((x/255 - mean)/std)."""
    x = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(spec.mean, jnp.float32)
    std = jnp.asarray(spec.std, jnp.float32)
    return (x - mean) / std


def augment(key: jax.Array, images: jnp.ndarray, spec: ImageSpec) -> jnp.ndarray:
    """Random crop (zero padding `pad`) + horizontal flip on an NHWC batch.

    Matches torchvision RandomCrop(size, padding=pad) + RandomHorizontalFlip
    semantics; implemented with a single padded tensor + per-image dynamic
    slices so the whole batch stays one fused XLA computation.
    """
    n = images.shape[0]
    out = images
    if spec.random_crop_pad > 0:
        p = spec.random_crop_pad
        kx, ky, key = jax.random.split(key, 3)[0:3]
        padded = jnp.pad(out, ((0, 0), (p, p), (p, p), (0, 0)))
        ox = jax.random.randint(kx, (n,), 0, 2 * p + 1)
        oy = jax.random.randint(ky, (n,), 0, 2 * p + 1)

        def crop(img, dx, dy):
            return jax.lax.dynamic_slice(
                img, (dx, dy, 0), (spec.size, spec.size, spec.channels)
            )

        out = jax.vmap(crop)(padded, ox, oy)
    if spec.random_flip:
        kf = jax.random.fold_in(key, 1)
        flip = jax.random.bernoulli(kf, 0.5, (n,))
        out = jnp.where(flip[:, None, None, None], out[:, :, ::-1, :], out)
    return out
