"""Array-backed dataset splits.

The reference streams data through ``torch.utils.data.DataLoader``
(/root/reference/URSABench/datasets.py:244-261). On TPU the right shape is
the opposite: keep the whole split device-resident as one uint8 NHWC array +
int32 labels, normalize/augment *inside jit*, and let samplers drive batching
with ``lax.scan`` over gathered permutations. ``DataSplit`` is that
container; it still offers a host-side iterator for compatibility.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Iterator, Tuple

import jax.numpy as jnp
import numpy as np

from .transforms import ImageSpec, normalize


@dataclass
class DataSplit:
    images: np.ndarray  # uint8 NHWC
    labels: np.ndarray  # int64
    batch_size: int
    spec: ImageSpec  # transform applied when batches are drawn
    shuffle: bool = False
    dataset_name: str = ""

    def __post_init__(self):
        assert self.images.ndim == 4 and self.images.dtype == np.uint8
        self.labels = np.asarray(self.labels, np.int64)

    def __len__(self) -> int:
        return self.images.shape[0]

    @property
    def n(self) -> int:
        return self.images.shape[0]

    @property
    def num_batches(self) -> int:
        return -(-self.n // self.batch_size)

    def device_arrays(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Whole split as device arrays (uint8 images, int32 labels)."""
        return jnp.asarray(self.images), jnp.asarray(self.labels, jnp.int32)

    def batches(self, normalized: bool = True) -> Iterator[Tuple[jnp.ndarray, jnp.ndarray]]:
        """Host-side sequential iteration (no shuffling/augmentation) —
        used by evaluation tasks, mirroring the reference's shuffle=False
        test loaders."""
        for i in range(0, self.n, self.batch_size):
            x = jnp.asarray(self.images[i: i + self.batch_size])
            if normalized:
                x = normalize(x, self.spec)
            y = jnp.asarray(self.labels[i: i + self.batch_size], jnp.int32)
            yield x, y

    def with_spec(self, spec: ImageSpec) -> "DataSplit":
        return replace(self, spec=spec)

    def subset(self, idx: np.ndarray) -> "DataSplit":
        return replace(self, images=self.images[idx], labels=self.labels[idx])
