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

# ImageNet 224^2 normalization, the reference's trtprof input pipeline
# (/root/reference/URSABench/trtprof/dataset.py:37)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
IMAGENET_TRAIN = ImageSpec(224, 3, IMAGENET_MEAN, IMAGENET_STD, random_flip=True)
IMAGENET_TEST = ImageSpec(224, 3, IMAGENET_MEAN, IMAGENET_STD)


def normalize(images: jnp.ndarray, spec: ImageSpec) -> jnp.ndarray:
    """uint8 NHWC -> normalized float32 NHWC ((x/255 - mean)/std)."""
    x = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(spec.mean, jnp.float32)
    std = jnp.asarray(spec.std, jnp.float32)
    return (x - mean) / std


def augment(key: jax.Array, images: jnp.ndarray, spec: ImageSpec,
            pad_value: jnp.ndarray | float = 0.0) -> jnp.ndarray:
    """Random crop (`pad_value` border) + horizontal flip on an NHWC batch.

    Matches torchvision RandomCrop(size, padding=pad) + RandomHorizontalFlip
    semantics. The crop is ONE fused gather via per-image row/col index
    grids — a vmap of dynamic_slice lowers to n separate slices, and any of
    this on uint8 data hits pathological int8 tile layouts on TPU (~600x
    slower measured) — so call this on f32 data (see augment_normalized).
    """
    n = images.shape[0]
    out = images
    flip = None
    if spec.random_flip:
        kf = jax.random.fold_in(key, 1)
        flip = jax.random.bernoulli(kf, 0.5, (n,))
    if spec.random_crop_pad > 0:
        p = spec.random_crop_pad
        kx, ky = jax.random.split(key)
        n_, h, w, c = out.shape
        ox = jax.random.randint(kx, (n,), 0, 2 * p + 1)
        oy = jax.random.randint(ky, (n,), 0, 2 * p + 1)
        # crop as two one-hot einsums: selection matmuls ride the MXU where
        # a per-image gather stalls the epoch (~3x slower measured end to
        # end on TPU v5e; exact because one-hot rows multiply by 1.0).
        # PADLESS form: contract against the UNPADDED image — the one-hot
        # target is the source row r = ox + i - p (all-zero row when r is
        # outside [0, h)), and the `pad_value` border is added back through
        # the in-range indicator outer product. vs the padded form this
        # cuts the contraction dim from h+2p to h (0.71x the MACs at
        # CIFAR's 32/4) and never materializes the (n, h+2p, w+2p, c)
        # padded tensor.
        fdt = out.dtype if jnp.issubdtype(out.dtype, jnp.floating) else jnp.float32
        rows = (
            jnp.arange(h)[None, None, :]
            == (ox[:, None, None] - p + jnp.arange(h)[None, :, None])
        ).astype(fdt)  # (n, i, r): source row of crop row i (0 if border)
        jsel = jnp.arange(w)[None, :]
        if flip is not None:
            # fuse the horizontal flip into the column one-hot:
            # flip(crop(img))[i, j] == src[ox+i-p, oy + (w-1-j) - p], so a
            # per-image reversed column target is bit-exact flip-after-crop
            # and saves a full-batch reverse+select pass per step
            jsel = jnp.where(flip[:, None], w - 1 - jsel, jsel)
        cols = (
            jnp.arange(w)[None, None, :]
            == (oy[:, None, None] - p + jsel[:, :, None])
        ).astype(fdt)  # (n, j, s): source col of crop col j (0 if border)
        t = jnp.einsum("nir,nrsc->nisc", rows, out.astype(fdt))
        interior = jnp.einsum("njs,nisc->nijc", cols, t)
        # border: both selectors in range -> interior value; else pad_value
        in_range = (rows.sum(2)[:, :, None] * cols.sum(2)[:, None, :])
        pv = jnp.asarray(pad_value, fdt)
        out = (interior + (1.0 - in_range)[..., None] * pv).astype(out.dtype)
    elif flip is not None:
        out = jnp.where(flip[:, None, None, None], out[:, :, ::-1, :], out)
    return out


def augment_normalized(key: jax.Array, x: jnp.ndarray, spec: ImageSpec) -> jnp.ndarray:
    """Augment an already-normalized f32 batch, padding the crop border with
    the normalized value of a zero pixel ((0 - mean)/std) so semantics match
    torchvision's pad-before-normalize pipeline exactly."""
    pv = -jnp.asarray(spec.mean, jnp.float32) / jnp.asarray(spec.std, jnp.float32)
    return augment(key, x, spec, pad_value=pv)
