"""Raw dataset readers + deterministic synthetic fallback.

The reference relies on torchvision's downloaders
(/root/reference/URSABench/datasets.py:150-171). This environment has no
network egress, so we read the standard on-disk binary formats directly
(MNIST idx, CIFAR pickle batches, SVHN .mat, STL-10 bin) when present under
``path`` and otherwise produce a *deterministic synthetic* dataset with the
same shape/cardinality profile: class-conditional templates + noise, so
models genuinely learn and every downstream metric is exercised.
"""

from __future__ import annotations

import gzip
import hashlib
import os
import pickle
import struct
import time
from typing import Tuple

import numpy as np

# name -> (size, channels, num_classes, n_train, n_test)
DATASET_PROFILES = {
    "MNIST": (28, 1, 10, 60000, 10000),
    "FashionMNIST": (28, 1, 10, 60000, 10000),
    "KMNIST": (28, 1, 10, 60000, 10000),
    "CIFAR10": (32, 3, 10, 50000, 10000),
    "CIFAR100": (32, 3, 100, 50000, 10000),
    "SVHN": (32, 3, 10, 73257, 10000),
    "STL10": (32, 3, 10, 5000, 8000),
    "TIN": (64, 3, 200, 100000, 10000),
    # LSUN (10 scene categories) / CelebA: the reference defers to
    # torchvision downloads (datasets.py:165-168); here both read an on-disk
    # <root>/{train,test}/<class>/ ImageFolder tree (class count from disk)
    # with a 10-class synthetic fallback profile under zero egress
    "LSUN": (64, 3, 10, 10000, 1000),
    "CelebA": (64, 3, 10, 10000, 1000),
}

# STL-10 labels remapped to CIFAR class order (datasets.py:163)
STL_CLS_MAPPING = np.array([0, 2, 1, 3, 4, 5, 7, 6, 8, 9])

# Canonical per-dataset pixel statistics in [0,1] units (the torchvision
# constants the protocol ImageSpecs normalize by). The synthetic fallback
# affinely remaps its generated images to these moments so the STANDARD
# transforms standardize it exactly like the real dataset: without this,
# MNIST-family synthetic data (raw mean ~0.5) normalized by the real-MNIST
# stats (0.1307/0.3081) carries a +1.2 common-mode offset at 3.2x scale —
# measured to collapse momentum-SGMCMC training (MLP/MNIST SGHMC lr 0.03:
# 89.9% error; with matched stats it trains normally). CIFAR-family stats
# (~0.49/0.2) happen to match the raw generator, which is why only the
# MNIST family was affected.
_CANON_STATS = {
    "MNIST": ((0.1307,), (0.3081,)),
    "FashionMNIST": ((0.2860,), (0.3530,)),
    "KMNIST": ((0.1918,), (0.3483,)),
    "CIFAR10": ((0.4914, 0.4822, 0.4465), (0.2470, 0.2435, 0.2616)),
    "CIFAR100": ((0.5071, 0.4865, 0.4409), (0.2673, 0.2564, 0.2762)),
    "SVHN": ((0.4377, 0.4438, 0.4728), (0.1980, 0.2010, 0.1970)),
    "STL10": ((0.4467, 0.4398, 0.4066), (0.2242, 0.2215, 0.2239)),
    "TIN": ((0.4802, 0.4481, 0.3975), (0.2770, 0.2691, 0.2821)),
    "LSUN": ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    "CelebA": ((0.506, 0.426, 0.383), (0.265, 0.245, 0.241)),
}


# ---------------------------------------------------------------------------
# Binary format readers
# ---------------------------------------------------------------------------


def _open_maybe_gz(path: str):
    if os.path.exists(path + ".gz"):
        return gzip.open(path + ".gz", "rb")
    return open(path, "rb")


def _read_idx(path: str) -> np.ndarray:
    with _open_maybe_gz(path) as f:
        magic = struct.unpack(">I", f.read(4))[0]
        ndim = magic & 0xFF
        dims = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), np.uint8).reshape(dims)


def _find(root: str, candidates) -> str | None:
    for c in candidates:
        for base in (root, os.path.join(root, "raw")):
            p = os.path.join(base, c)
            if os.path.exists(p) or os.path.exists(p + ".gz"):
                return p
    return None


def read_mnist_like(root: str, train: bool) -> Tuple[np.ndarray, np.ndarray] | None:
    kind = "train" if train else "t10k"
    imgs = _find(root, [f"{kind}-images-idx3-ubyte", f"{kind}-images.idx3-ubyte"])
    lbls = _find(root, [f"{kind}-labels-idx1-ubyte", f"{kind}-labels.idx1-ubyte"])
    if imgs is None or lbls is None:
        return None
    x = _read_idx(imgs)[..., None]  # N,28,28,1
    y = _read_idx(lbls).astype(np.int64)
    return x, y


def read_cifar(root: str, train: bool, variant: int = 10) -> Tuple[np.ndarray, np.ndarray] | None:
    """Read the REQUESTED CIFAR variant only — a shared data dir often holds
    both cifar-10-batches-py and cifar-100-python, and picking by directory
    presence would silently load the wrong dataset."""
    c10 = os.path.join(root, "cifar-10-batches-py")
    c100 = os.path.join(root, "cifar-100-python")
    if variant == 100 and os.path.isdir(c100):
        files = ["train"] if train else ["test"]
        base, key = c100, b"fine_labels"
    elif variant == 10 and os.path.isdir(c10):
        files = [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
        base, key = c10, b"labels"
    else:
        return None
    xs, ys = [], []
    for fn in files:
        with open(os.path.join(base, fn), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        xs.append(d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1))
        ys.append(np.asarray(d[key], np.int64))
    return np.concatenate(xs), np.concatenate(ys)


def read_svhn(root: str, split: str) -> Tuple[np.ndarray, np.ndarray] | None:
    path = os.path.join(root, f"{split}_32x32.mat")
    if not os.path.exists(path):
        return None
    from scipy.io import loadmat

    d = loadmat(path)
    x = d["X"].transpose(3, 0, 1, 2).astype(np.uint8)  # N,32,32,3
    y = d["y"].reshape(-1).astype(np.int64) % 10  # '10' means digit 0
    return x, y


def read_image_folder(
    root: str, size: int, classes: list[str] | None = None
) -> Tuple[np.ndarray, np.ndarray] | None:
    """torchvision ImageFolder-equivalent: root/<class>/**/*.{jpeg,jpg,png},
    classes sorted alphabetically -> label ids (the tin_loaders path,
    datasets.py:101-135). Pass ``classes`` to pin the class->id mapping (so
    train/test splits agree even if one is missing a class on disk); class
    dirs present here but absent from ``classes`` are an error, not a silent
    relabel. Requires PIL; returns None if absent/empty."""
    if not os.path.isdir(root):
        return None
    try:
        from PIL import Image
    except ImportError:
        return None
    on_disk = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    if classes is None:
        classes = on_disk
    else:
        unknown = set(on_disk) - set(classes)
        if unknown:
            raise ValueError(
                f"{root}: class dirs {sorted(unknown)} not present in the "
                f"reference split's class list {classes}; the train/test "
                "trees must share one class set"
            )
    class_to_id = {c: i for i, c in enumerate(classes)}
    xs, ys = [], []
    for cls in on_disk:
        label = class_to_id[cls]
        for dirpath, _, files in os.walk(os.path.join(root, cls)):
            for fn in sorted(files):
                if not fn.lower().endswith((".jpeg", ".jpg", ".png")):
                    continue
                img = Image.open(os.path.join(dirpath, fn)).convert("RGB")
                if img.size != (size, size):
                    img = img.resize((size, size))
                xs.append(np.asarray(img, np.uint8))
                ys.append(label)
    if not xs:
        return None
    return np.stack(xs), np.asarray(ys, np.int64)


def read_split_image_folder(
    root: str, train: bool, size: int
) -> Tuple[np.ndarray, np.ndarray] | None:
    """Directory layout <root>/{train,test}/<class>/... (TinyImageNet-style,
    also serves LSUN/CelebA exports). The train/ listing defines the
    class->id mapping for BOTH splits so the two trees can never silently
    disagree on label ids."""
    train_root = os.path.join(root, "train")
    classes = None
    if os.path.isdir(train_root):
        classes = sorted(
            d for d in os.listdir(train_root)
            if os.path.isdir(os.path.join(train_root, d))
        ) or None
    return read_image_folder(
        os.path.join(root, "train" if train else "test"), size, classes=classes
    )


def read_tin(root: str, train: bool) -> Tuple[np.ndarray, np.ndarray] | None:
    """TinyImageNet directory layout: <root>/{train,test}/<class>/..."""
    return read_split_image_folder(root, train, 64)


def read_stl10(root: str, train: bool) -> Tuple[np.ndarray, np.ndarray] | None:
    base = os.path.join(root, "stl10_binary")
    kind = "train" if train else "test"
    xi = os.path.join(base, f"{kind}_X.bin")
    yi = os.path.join(base, f"{kind}_y.bin")
    if not (os.path.exists(xi) and os.path.exists(yi)):
        return None
    x = np.fromfile(xi, np.uint8).reshape(-1, 3, 96, 96).transpose(0, 3, 2, 1)
    y = np.fromfile(yi, np.uint8).astype(np.int64) - 1
    # downsample 96 -> 32 (3x average pool) to match the reference's Resize(32)
    x = x.reshape(-1, 32, 3, 32, 3, 3).mean(axis=(2, 4)).astype(np.uint8)
    return x, y


# ---------------------------------------------------------------------------
# Deterministic synthetic fallback
# ---------------------------------------------------------------------------


_SYNTH_GEN_VERSION = "v6"  # bump when the generator's RNG consumption changes

# Difficulty of the synthetic fallback. 'separation' is the pairwise Bayes
# z-score between class templates (pairwise optimal error = Phi(-z)):
# templates are a SHARED base image plus per-class offsets scaled so
# ||t_i - t_j|| / (2*noise) == z in expectation — unlike fully independent
# templates (z in the hundreds), this puts genuine class overlap in the
# data so trained models land at realistic operating points (error ~5-20%,
# ECE ~1e-2, misclassifications for the misclass-AUROC metrics to rank)
# rather than the degenerate 0%-error regime. 'label_noise' resamples that
# fraction of labels uniformly (images keep their true class), adding an
# aleatoric error floor so even a Bayes-optimal model misclassifies.
_SYNTH_DIFFICULTY_DEFAULT = {
    "separation": 3.0, "noise": 48.0, "label_noise": 0.02,
    # 'base_shift' (same z-units as 'separation') is each dataset's smooth
    # offset from the SHARED per-shape base image. Same-shape datasets used
    # as OOD pairs (MNIST<->FashionMNIST/KMNIST, CIFAR<->SVHN) therefore
    # overlap the in-distribution manifold at a CONTROLLABLE distance —
    # independent bases made every OOD pairing trivially separable
    # (AUROC ~0.996, a degenerate operating point for the OOD task).
    # Calibrated on the MLP/MNIST<->FashionMNIST/KMNIST proxy: shift 1.0
    # lands total/model-uncertainty AUROC ~0.65-0.78; larger shifts DROP
    # detection (far-OOD inputs drive confidently-wrong extreme logits).
    "base_shift": 1.0,
    # 'field_overlap' (rho in [0,1]) mixes each dataset's class fields with
    # a SHARED per-shape class-field bank: field = sqrt(1-rho^2)*own +
    # rho*shared[class]. Within a dataset the pairwise z-geometry is
    # unchanged (bank entries are independent across classes), but
    # same-shape OOD pairs now share rho^2 of each matched class's field —
    # so a model trained in-distribution reads genuine class-j evidence in
    # OOD class-j images and assigns them moderate (not uniformly diffuse)
    # confidence. This is what keeps the OOD task exercised BELOW the
    # ceiling for high-capacity models: the shared base alone left
    # WRN-28x10 CIFAR100<->SVHN at AUROC 0.994 (v5), because a saturated
    # model is diffuse on everything off-manifold. Calibrated on
    # benchmarks/ood_calibration.py.
    "field_overlap": 0.6,
}
# Per-dataset overrides, calibrated empirically (nearest-empirical-mean
# error, the Bayes proxy for this generative family) so trained models land
# at ~5-20% test error: clipping at the uint8 bounds, the smooth-field
# spatial correlation, and empirical-mean noise push realized error well
# above the ideal Phi(-z), and many-class profiles need more separation
# (error is a union over k-1 pairwise overlaps). Measured v4 proxies:
# MNIST z3 -> 11%, CIFAR10 z3 -> 11%, CIFAR100 z5.5 -> ~20%,
# LSUN z3.5 -> 13%. Conv-model check (PreResNet-8, 6 epochs, 8k train,
# CIFAR10 z3): 22% plain / 35% under crop+flip augmentation.
_SYNTH_DIFFICULTY = {
    # MNIST family: the canon-stats remap (dark mean, hard [0,255] clip)
    # eats part of the class-field signal in the clipped tail, so the
    # pre-clip z is raised to keep the nearest-mean proxy at ~8-13%
    # (measured v6: z4 -> MNIST 13%, FashionMNIST 7.6%, KMNIST 10.4%;
    # z3 had drifted to 20-26%)
    "MNIST": {"separation": 4.0},
    "FashionMNIST": {"separation": 4.0},
    "KMNIST": {"separation": 4.0},
    # CIFAR100: the nearest-mean proxy said z5.5 -> ~20%, but a trained
    # WRN-28x10 (config4) reached 2.4% there — outside the 5-20% design
    # band, pinned at the 2% label-noise floor. Re-calibrated against the
    # trained model on the CIFAR100<->SVHN OOD pair
    # (assets/cifar100_difficulty_sweep.json, r5): the knife-edge map has
    # separation alone INVERTING OOD AUROC below z~4.6 (off-manifold SVHN
    # draws genuine class evidence and scores LESS uncertain than hard
    # in-dist images) and label noise >~0.05 regularizing the
    # confidently-wrong logits so hard that AUROC saturates >0.93.
    # z4.5 + 4% label noise lands seeds 6/7/8 at 6.0-6.4% error with
    # total-AUROC 0.74-0.83, model-AUROC 0.87-0.94 — in band, not
    # saturated, not inverted.
    "CIFAR100": {"separation": 4.5, "label_noise": 0.04},
    "TIN": {"separation": 6.0},
    "LSUN": {"separation": 3.5},
    "CelebA": {"separation": 3.5},
}


def resolve_difficulty(name: str, difficulty: dict | None = None) -> dict:
    """Per-dataset synthetic difficulty: defaults, dataset overrides, then
    caller overrides. Unknown keys are an error, not a silent ignore."""
    d = dict(_SYNTH_DIFFICULTY_DEFAULT)
    d.update(_SYNTH_DIFFICULTY.get(name, {}))
    if difficulty:
        unknown = set(difficulty) - set(d)
        if unknown:
            raise ValueError(
                f"unknown difficulty keys {sorted(unknown)}; "
                f"valid: {sorted(d)}"
            )
        d.update(difficulty)
    return {k: float(v) for k, v in d.items()}


def _synth_cache_path(name: str, train: bool, n: int, seed: int,
                      diff: dict) -> str | None:
    root = os.environ.get("URSA_SYNTH_CACHE", "/tmp/ursabench_synth_cache")
    if root in ("", "0"):
        return None
    dtag = (f"z{diff['separation']:g}-s{diff['noise']:g}"
            f"-ln{diff['label_noise']:g}-b{diff['base_shift']:g}"
            f"-fo{diff['field_overlap']:g}")
    tag = (f"{name}-{'train' if train else 'test'}-{n}-{seed}-{dtag}"
           f"-{_SYNTH_GEN_VERSION}")
    return os.path.join(root, tag)


def _synth_cache_load(name, train, n, seed, diff):
    """mmap'd cache read: under remote-TPU tunnels the PJRT plugin makes
    anonymous first-touch page faults ~170x slower, but FILE-backed mappings
    fault at full speed — so cache hits are served as read-only memmaps
    (np.load copies pay ~25s for CIFAR-size arrays; the memmap is free)."""
    base = _synth_cache_path(name, train, n, seed, diff)
    if base is None or not os.path.exists(base + ".x.npy"):
        return None
    try:
        x = np.load(base + ".x.npy", mmap_mode="r")
        y = np.load(base + ".y.npy")
        return x, y
    except Exception:
        return None  # corrupt/partial cache entry: regenerate


def _sweep_stale_tmp(cache_dir: str, max_age_s: float = 3600.0) -> None:
    """Remove interrupted generations' tmp memmaps (dataset-sized files no
    code path would otherwise ever delete). Age-gated so a concurrent
    process's live tmp file is left alone."""
    try:
        now = time.time()
        for fn in os.listdir(cache_dir):
            if ".tmp." not in fn:
                continue
            p = os.path.join(cache_dir, fn)
            try:
                if now - os.path.getmtime(p) > max_age_s:
                    os.remove(p)
            except OSError:
                pass
    except OSError:
        pass


def _synth_writable_output(name, train, n, seed, diff, shape):
    """The uint8 output buffer for generation: a w+ file memmap at a tmp
    cache path when caching (file-backed pages dodge the slow-fault path
    AND saving is free), else plain memory. Returns (array, commit_fn);
    commit_fn returns the final array to hand out (a READ-ONLY reopen of
    the committed file — returning the writable memmap would alias the
    cache, so a caller's in-place mutation would silently corrupt every
    future cache hit)."""
    base = _synth_cache_path(name, train, n, seed, diff)
    if base is not None:
        try:
            os.makedirs(os.path.dirname(base), exist_ok=True)
            _sweep_stale_tmp(os.path.dirname(base))
            tmp = f"{base}.tmp.{os.getpid()}.x.npy"
            x = np.lib.format.open_memmap(
                tmp, mode="w+", dtype=np.uint8, shape=shape
            )

            def commit(y):
                x.flush()
                # y first: a reader that sees x.npy can rely on y.npy
                np.save(f"{base}.tmp.{os.getpid()}.y.npy", y)
                os.replace(f"{base}.tmp.{os.getpid()}.y.npy", base + ".y.npy")
                os.replace(tmp, base + ".x.npy")
                return np.load(base + ".x.npy", mmap_mode="r")

            return x, commit
        except Exception:
            pass
    x = np.empty(shape, np.uint8)
    return x, lambda y: x  # no cache: hand out the in-memory buffer as-is


def _bilinear_upsample(coarse: np.ndarray, size: int) -> np.ndarray:
    """(k, g, g, ch) -> (k, size, size, ch) separable bilinear interp."""
    g = coarse.shape[1]
    pos = np.linspace(0.0, g - 1.0, size)
    i0 = np.clip(pos.astype(np.int64), 0, g - 2)
    w = (pos - i0).astype(np.float32)
    rows = (coarse[:, i0] * (1.0 - w)[None, :, None, None]
            + coarse[:, i0 + 1] * w[None, :, None, None])
    out = (rows[:, :, i0] * (1.0 - w)[None, None, :, None]
           + rows[:, :, i0 + 1] * w[None, None, :, None])
    return out


def _smooth_symmetric_fields(rng, k: int, size: int, ch: int) -> np.ndarray:
    """Per-class unit-std smooth fields: coarse Gaussian grids (one cell per
    ~4 px) bilinearly upsampled, symmetrized along width (flip-invariant),
    then standardized per class so the caller's sep_px scaling is exact."""
    # one cell per ~8 px: a +-4 px random crop shifts half a cell, so the
    # class field stays ~0.75-correlated under the standard augmentation
    g = max(4, size // 8)
    coarse = rng.normal(0.0, 1.0, size=(k, g, g, ch)).astype(np.float32)
    fields = _bilinear_upsample(coarse, size)
    fields = 0.5 * (fields + fields[:, :, ::-1, :])  # width-flip symmetric
    std = fields.reshape(k, -1).std(axis=1).reshape(k, 1, 1, 1)
    mean = fields.reshape(k, -1).mean(axis=1).reshape(k, 1, 1, 1)
    return (fields - mean) / np.maximum(std, 1e-6)


def _shared_class_fields(size: int, ch: int, k: int, seed: int) -> np.ndarray:
    """The per-SHAPE class-field bank for 'field_overlap': deterministic in
    (shape, seed) only, so any two same-shape datasets draw the SAME first-k
    prefix — class j of CIFAR10/SVHN/CIFAR100 shares one bank entry."""
    d = hashlib.sha256(
        f"{size}x{size}x{ch}/ursabench-synth-classbank/{seed}".encode()
    ).digest()
    r = np.random.Generator(
        np.random.Philox(int.from_bytes(d[:4], "little") % (2 ** 31))
    )
    return _smooth_symmetric_fields(r, k, size, ch)


def synthetic(
    name: str, train: bool, n: int | None = None, seed: int = 0,
    difficulty: dict | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Class-conditional template + noise images, deterministic per
    (dataset, split). Templates share a base image with per-class offsets
    sized by the 'separation' Bayes z-score (see resolve_difficulty), so
    classes genuinely overlap: trained models land at realistic error /
    calibration operating points and the misclassification-ranking metrics
    have actual misclassifications to rank. 'label_noise' resamples that
    fraction of labels uniformly for an aleatoric error floor."""
    size, ch, k, n_train, n_test = DATASET_PROFILES[name]
    if n is None:
        n = n_train if train else n_test
    diff = resolve_difficulty(name, difficulty)
    cached = _synth_cache_load(name, train, n, seed, diff)
    if cached is not None:
        return cached
    # stable across processes (builtin hash() is salted per interpreter)
    digest = hashlib.sha256(f"{name}/ursabench-synth/{seed}".encode()).digest()
    root_seed = int.from_bytes(digest[:4], "little") % (2 ** 31)
    rng = np.random.Generator(np.random.Philox(root_seed))
    noise = diff["noise"]
    dim = size * size * ch
    # ||t_i - t_j|| = sep_px * sqrt(2*dim) in expectation; divide by 2*noise
    # to get the pairwise z-score 'separation'
    sep_px = diff["separation"] * 2.0 * noise / np.sqrt(2.0 * dim)
    # the base image is shared across all same-shape datasets (keyed by
    # shape, not name) + a per-dataset smooth 'base_shift' offset: OOD
    # pairings land at a calibrated distance from the in-distribution
    # manifold instead of a trivially separable one (resolve_difficulty)
    base_digest = hashlib.sha256(
        f"{size}x{size}x{ch}/ursabench-synth-base/{seed}".encode()
    ).digest()
    base_rng = np.random.Generator(
        np.random.Philox(int.from_bytes(base_digest[:4], "little") % (2 ** 31))
    )
    base = base_rng.uniform(40, 215, size=(size, size, ch)).astype(np.float32)
    # the shift field is ALWAYS drawn (base_shift only scales it) so the
    # downstream class-field realization is identical across base_shift
    # settings — base_shift=0 then collapses the bases exactly, all else
    # equal (tests/test_data.py pins this monotonicity)
    shift_px = diff["base_shift"] * 2.0 * noise / np.sqrt(2.0 * dim)
    base = base + _smooth_symmetric_fields(rng, 1, size, ch)[0] * shift_px
    # class offsets are SMOOTH (low-frequency bilinear fields) and
    # left-right SYMMETRIC, normalized to unit per-pixel std so the
    # z-score semantics above hold exactly. Rationale: iid per-pixel
    # offsets carry zero local structure, which (a) conv+GAP models
    # cannot represent (the signal lives in position-specific linear
    # combinations a translation-invariant net averages away — measured:
    # PreResNet-8 stuck at ~80% error where the Bayes proxy is 12%) and
    # (b) random-crop/flip augmentation destroys. Smooth symmetric fields
    # behave like real image content: locally correlated, tolerant to
    # +-4px crops and horizontal flips.
    fields = _smooth_symmetric_fields(rng, k, size, ch)
    rho = diff["field_overlap"]
    if rho > 0:
        shared = _shared_class_fields(size, ch, k, seed)
        fields = np.sqrt(1.0 - rho * rho) * fields + rho * shared
        # re-standardize so sep_px keeps its exact z-score semantics (the
        # mixture of two empirically-standardized fields is ~unit std, not
        # exactly); cross-dataset correlation stays ~rho^2
        std = fields.reshape(k, -1).std(axis=1).reshape(k, 1, 1, 1)
        mean = fields.reshape(k, -1).mean(axis=1).reshape(k, 1, 1, 1)
        fields = (fields - mean) / np.maximum(std, 1e-6)
    offsets = fields * sep_px
    templates = base[None] + offsets
    # affine-remap to the dataset's canonical pixel moments (_CANON_STATS)
    # so the protocol transforms standardize synthetic data exactly like
    # real data. Per-channel: model mean = E[templates], model var =
    # Var[templates] + noise^2 (uniform class draw + iid noise, pre-clip).
    # z-score geometry is invariant (signal and noise scale together).
    canon = _CANON_STATS.get(name)
    noise_c = np.full((1, 1, 1, ch), noise, np.float32)
    if canon is not None:
        mean_t = 255.0 * np.asarray(canon[0], np.float32)
        std_t = 255.0 * np.asarray(canon[1], np.float32)
        mean_m = templates.mean(axis=(0, 1, 2))
        std_m = np.sqrt(templates.var(axis=(0, 1, 2)) + noise * noise)
        a = std_t / np.maximum(std_m, 1e-6)
        b = mean_t - a * mean_m
        # the [0,255] clip shifts realized moments off target for dark
        # low-std datasets (MNIST: 1/3 of the pre-clip mass is below 0);
        # fixed-point correct (a, b) on an independent probe sample so the
        # POST-clip moments hit the canon stats
        probe_rng = np.random.Generator(np.random.Philox(root_seed + 7))
        yp = probe_rng.integers(0, k, size=512)
        xp = (templates[yp]
              + probe_rng.standard_normal(
                  (512, size, size, ch)).astype(np.float32) * noise)
        # joint rounds first, then mean-only: for dark low-std targets the
        # exact (mean, std) pair is infeasible for a clipped Gaussian (std
        # converges, a grows unboundedly toward a quasi-binary image while
        # the mean stalls) — and a mean offset is what hurts downstream
        # optimization, so the mean gets the last word
        for it in range(8):
            clipped = np.clip(a * xp + b, 0.0, 255.0)
            m_r = clipped.mean(axis=(0, 1, 2))
            s_r = clipped.std(axis=(0, 1, 2))
            if it < 4:
                a = a * std_t / np.maximum(s_r, 1e-6)
            b = b + (mean_t - m_r)
        a = a.astype(np.float32)
        b = b.astype(np.float32)
        templates = a * templates + b
        noise_c = noise_c * a
    split_rng = np.random.Generator(
        np.random.Philox(root_seed + (1 if train else 2))
    )
    y = split_rng.integers(0, k, size=n)
    # label noise: images are generated from the TRUE class y; the returned
    # labels resample a fraction uniformly (so a fraction ~ln*(k-1)/k of
    # points is mislabeled no matter how good the model)
    y_out = y
    if diff["label_noise"] > 0:
        flip = split_rng.random(n) < diff["label_noise"]
        y_out = np.where(flip, split_rng.integers(0, k, size=n), y)
    # Chunked generation into ONE preallocated uint8 output with a reused
    # f32 workspace. Under remote-TPU tunnels the PJRT plugin intercepts
    # first-touch page faults (~170x slower than normal), so the naive
    # whole-set float64 temporaries (GBs) cost minutes; this path touches
    # only n*size*size*ch uint8 bytes once plus a fixed 2k-image scratch.
    x, commit = _synth_writable_output(
        name, train, n, seed, diff, (n, size, size, ch)
    )
    chunk = 2048
    work = np.empty((chunk, size, size, ch), np.float32)
    tbuf = np.empty((chunk, size, size, ch), np.float32)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        w, t = work[: hi - lo], tbuf[: hi - lo]
        split_rng.standard_normal(out=w, dtype=np.float32)
        np.take(templates, y[lo:hi], axis=0, out=t)
        w *= noise_c
        w += t
        np.clip(w, 0, 255, out=w)
        x[lo:hi] = w
    y_out = y_out.astype(np.int64)
    return commit(y_out), y_out


def load_raw(
    name: str, path: str | None, train: bool, allow_synthetic: bool = True,
    synthetic_n: int | None = None, difficulty: dict | None = None,
) -> Tuple[np.ndarray, np.ndarray, bool]:
    """Returns (images uint8 NHWC, labels int64, is_synthetic)."""
    if name not in DATASET_PROFILES:
        raise NotImplementedError(f"Unknown dataset {name}")
    out = None
    if path is not None:
        root = path
        if name in ("CIFAR10", "CIFAR100", "MNIST"):
            # reference joins the lowercased name (datasets.py:148-150)
            sub = os.path.join(path, name.lower())
            root = sub if os.path.isdir(sub) else path
        if name in ("MNIST", "FashionMNIST", "KMNIST"):
            out = read_mnist_like(root, train)
        elif name in ("CIFAR10", "CIFAR100"):
            out = read_cifar(root, train, variant=100 if name == "CIFAR100" else 10)
        elif name == "SVHN":
            out = read_svhn(root, "train" if train else "test")
        elif name == "STL10":
            out = read_stl10(root, train)
        elif name == "TIN":
            out = read_tin(root, train)
        elif name in ("LSUN", "CelebA"):
            out = read_split_image_folder(
                root, train, DATASET_PROFILES[name][0]
            )
    if out is not None:
        x, y = out
        if name == "STL10":
            y = STL_CLS_MAPPING[y]
        return x, y, False
    if not allow_synthetic:
        raise FileNotFoundError(f"No on-disk data for {name} under {path!r}")
    x, y = synthetic(name, train, n=synthetic_n, difficulty=difficulty)
    if name == "STL10":
        y = STL_CLS_MAPPING[y]
    return x, y, True
