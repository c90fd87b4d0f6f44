"""Dataset loaders — parity surface with /root/reference/URSABench/datasets.py.

``loaders(...)`` mirrors the reference signature and semantics
(datasets.py:138-261): validation = random permuted split of train
(:198-211), CIFAR10 class splits via ``c10_classes`` (:11-14, :224-242),
decision-task imbalance injection (:173-195 + util.py:356-377), SVHN val
slicing (:61-98), STL10 class remap (:160-163). Returns array-backed
``DataSplit`` objects instead of torch DataLoaders.
"""

from __future__ import annotations

import numpy as np

from .arrays import DataSplit
from .sources import (DATASET_PROFILES, load_raw, resolve_difficulty,
                      synthetic)
from .transforms import ImageSpec

c10_classes = np.array([[0, 1, 2, 8, 9], [3, 4, 5, 6, 7]], dtype=np.int32)

# imbalance config per dataset: (labels, remove_frac)
# (datasets.py:173-195)
_IMBALANCE = {
    "MNIST": ([3, 7], 0.99),
    "CIFAR10": ([0, 1, 8, 9], 0.9),
    "CIFAR100": ([58, 69, 85], 0.9),
}


def increase_data_imbalance(
    labels: np.ndarray, images: np.ndarray, label: int, remove_frac: float = 0.9
):
    """Keep only the first ``N - remove_frac*N`` instances of ``label``
    (deterministic path of /root/reference/URSABench/util.py:356-377)."""
    mask = labels == label
    ind = np.where(mask)[0]
    n = len(ind)
    ind_keep = int(n - remove_frac * n)
    mask[ind[:ind_keep]] = False
    keep = ~mask
    return labels[keep], images[keep]


def loaders(
    dataset: str,
    path: str | None,
    batch_size: int,
    num_workers: int = 0,  # accepted for signature parity; array pipeline needs none
    transform_train: ImageSpec | None = None,
    transform_test: ImageSpec | None = None,
    use_validation: bool = True,
    val_size: float = 0.2,
    split_classes: int | None = None,
    shuffle_train: bool = True,
    imbalance: bool = False,
    seed: int = 0,
    synthetic_n_train: int | None = None,
    synthetic_n_test: int | None = None,
    difficulty: dict | None = None,
):
    del num_workers
    if dataset == "SVHN":
        return _svhn_loaders(
            path, batch_size, transform_train, transform_test,
            use_validation, val_size, shuffle_train,
            synthetic_n_train, synthetic_n_test, difficulty,
        )

    x_tr, y_tr, is_synth = load_raw(
        dataset, path, train=True, synthetic_n=synthetic_n_train,
        difficulty=difficulty,
    )
    # profile count when known — max(labels)+1 (the reference's inference,
    # datasets.py:171) undercounts on small synthetic subsets. LSUN/CelebA
    # read an arbitrary on-disk ImageFolder tree, so real data defines its
    # own class count (the reference's max(targets)+1, datasets.py:166-168).
    if dataset in ("LSUN", "CelebA") and not is_synth:
        num_classes = int(y_tr.max()) + 1
    elif dataset in DATASET_PROFILES:
        num_classes = DATASET_PROFILES[dataset][2]
    else:
        num_classes = int(y_tr.max()) + 1

    if imbalance and dataset in _IMBALANCE:
        labels, frac = _IMBALANCE[dataset]
        for l in labels:
            y_tr, x_tr = increase_data_imbalance(y_tr, x_tr, l, remove_frac=frac)

    if use_validation:
        n_val = int(len(x_tr) * val_size)
        rng = np.random.Generator(np.random.Philox(seed))
        r_ind = rng.permutation(len(x_tr))
        x_te, y_te = x_tr[r_ind[-n_val:]], y_tr[r_ind[-n_val:]]
        x_tr, y_tr = x_tr[r_ind[:-n_val]], y_tr[r_ind[:-n_val]]
    else:
        x_te, y_te, te_synth = load_raw(
            dataset, path, train=False, synthetic_n=synthetic_n_test,
            difficulty=difficulty,
        )
        if dataset in ("LSUN", "CelebA") and te_synth != is_synth:
            # num_classes is data-defined for these; a half-present export
            # (real train/ but missing test/, or vice versa) would pair a
            # k-class model with 10-class synthetic labels and jnp.take's
            # clip mode would turn that into silently wrong metrics
            raise ValueError(
                f"{dataset}: train split is "
                f"{'synthetic' if is_synth else 'on-disk'} but test split is "
                f"{'synthetic' if te_synth else 'on-disk'}; provide both "
                "splits on disk (or neither, for the synthetic fallback)"
            )
        if len(y_te) and int(y_te.max()) >= num_classes:
            raise ValueError(
                f"{dataset}: test labels reach {int(y_te.max())} but "
                f"num_classes={num_classes} from the train split"
            )

    if split_classes is not None:
        assert dataset == "CIFAR10" and split_classes in (0, 1)
        sel = c10_classes[split_classes]
        x_tr, y_tr = _remap_split(x_tr, y_tr, sel)
        x_te, y_te = _remap_split(x_te, y_te, sel)
        num_classes = len(sel)

    spec_tr = transform_train or ImageSpec(
        x_tr.shape[1], x_tr.shape[3], (0.5,) * x_tr.shape[3], (0.5,) * x_tr.shape[3]
    )
    spec_te = transform_test or spec_tr
    return (
        {
            "train": DataSplit(x_tr, y_tr, batch_size, spec_tr,
                               shuffle=shuffle_train, dataset_name=dataset),
            "test": DataSplit(x_te, y_te, batch_size, spec_te,
                              shuffle=False, dataset_name=dataset),
        },
        num_classes,
    )


def _remap_split(x, y, sel):
    mask = np.isin(y, sel)
    x, y = x[mask], y[mask]
    y = np.where(y[:, None] == sel[None, :])[1]
    return x, y


def _svhn_loaders(
    path, batch_size, transform_train, transform_test,
    use_validation, val_size, shuffle_train,
    synthetic_n_train, synthetic_n_test, difficulty=None,
):
    """SVHN uses trailing-slice validation, not a permuted split
    (datasets.py:61-98); the test set is truncated to 10000."""
    x_tr, y_tr, _ = load_raw("SVHN", path, train=True,
                             synthetic_n=synthetic_n_train,
                             difficulty=difficulty)
    if use_validation:
        v = int(val_size if val_size > 1 else len(x_tr) * val_size)
        x_te, y_te = x_tr[-v:], y_tr[-v:]
        x_tr, y_tr = x_tr[:-v], y_tr[:-v]
    else:
        x_te, y_te, _ = load_raw("SVHN", path, train=False,
                                 synthetic_n=synthetic_n_test,
                                 difficulty=difficulty)
        x_te, y_te = x_te[:10000], y_te[:10000]
    spec_tr = transform_train or ImageSpec(32, 3, (0.5,) * 3, (0.5,) * 3)
    spec_te = transform_test or spec_tr
    return (
        {
            "train": DataSplit(x_tr, y_tr, batch_size, spec_tr,
                               shuffle=shuffle_train, dataset_name="SVHN"),
            "test": DataSplit(x_te, y_te, batch_size, spec_te,
                              shuffle=False, dataset_name="SVHN"),
        },
        10,
    )


def loaders_inc(
    dataset: str,
    path: str | None,
    num_chunks: int,
    batch_size: int,
    num_workers: int = 0,
    transform_train: ImageSpec | None = None,
    transform_test: ImageSpec | None = None,
    use_validation: bool = True,
    val_size: int = 5000,
    shuffle_train: bool = True,
    seed: int = 1,
    synthetic_n_train: int | None = None,
    synthetic_n_test: int | None = None,
    difficulty: dict | None = None,
):
    """Incremental chunked loaders — parity with
    /root/reference/URSABench/datasets.py:264-326: one seeded permutation,
    the train set split into ``num_chunks`` ceil-divided chunks, validation
    carved from the permutation tail."""
    assert dataset in {"MNIST", "CIFAR10", "CIFAR100"}
    del num_workers
    x_tr, y_tr, _ = load_raw(dataset, path, train=True,
                             synthetic_n=synthetic_n_train,
                             difficulty=difficulty)
    num_classes = DATASET_PROFILES[dataset][2]
    total = len(x_tr)
    num_samples = (total - val_size) if use_validation else total
    order = np.random.RandomState(seed).permutation(total)

    spec_tr = transform_train or ImageSpec(
        x_tr.shape[1], x_tr.shape[3], (0.5,) * x_tr.shape[3], (0.5,) * x_tr.shape[3]
    )
    spec_te = transform_test or spec_tr

    chunks = []
    offset = 0
    remaining = num_samples
    for i in range(num_chunks, 0, -1):
        chunk_size = (remaining + i - 1) // i
        sel = order[offset: offset + chunk_size]
        chunks.append(
            DataSplit(x_tr[sel], y_tr[sel], batch_size, spec_tr,
                      shuffle=shuffle_train, dataset_name=dataset)
        )
        offset += chunk_size
        remaining -= chunk_size

    if use_validation:
        sel = order[-val_size:]
        test = DataSplit(x_tr[sel], y_tr[sel], batch_size, spec_te,
                         dataset_name=dataset)
    else:
        x_te, y_te, _ = load_raw(dataset, path, train=False,
                                 synthetic_n=synthetic_n_test,
                                 difficulty=difficulty)
        test = DataSplit(x_te, y_te, batch_size, spec_te, dataset_name=dataset)
    return {"train": chunks, "test": test}, num_classes


__all__ = [
    "loaders", "loaders_inc", "DataSplit", "ImageSpec", "c10_classes",
    "increase_data_imbalance", "DATASET_PROFILES", "synthetic",
    "resolve_difficulty",
]
