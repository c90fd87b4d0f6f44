"""Data layer: loaders semantics, splits, imbalance, loaders_inc, logging."""

import numpy as np
import pytest

from ursabench_tpu import data


def test_validation_split_disjoint():
    splits, C = data.loaders(
        "MNIST", None, batch_size=32, use_validation=True, val_size=0.25,
        synthetic_n_train=200, seed=3,
    )
    assert splits["train"].n == 150 and splits["test"].n == 50
    # deterministic given seed
    splits2, _ = data.loaders(
        "MNIST", None, batch_size=32, use_validation=True, val_size=0.25,
        synthetic_n_train=200, seed=3,
    )
    np.testing.assert_array_equal(splits["train"].labels, splits2["train"].labels)


def test_split_classes_cifar10():
    splits, C = data.loaders(
        "CIFAR10", None, batch_size=32, use_validation=False,
        split_classes=0, synthetic_n_train=400, synthetic_n_test=200,
    )
    assert C == 5
    assert set(np.unique(splits["train"].labels)) <= {0, 1, 2, 3, 4}


def test_imbalance_injection():
    splits, _ = data.loaders(
        "MNIST", None, batch_size=32, use_validation=False, imbalance=True,
        synthetic_n_train=2000, synthetic_n_test=100,
    )
    y = splits["train"].labels
    counts = np.bincount(y, minlength=10)
    # classes 3 and 7 reduced to ~1% of their original count
    others = np.mean([counts[i] for i in range(10) if i not in (3, 7)])
    assert counts[3] < 0.1 * others and counts[7] < 0.1 * others


def test_loaders_inc_chunks():
    loaders, C = data.loaders_inc(
        "MNIST", None, num_chunks=3, batch_size=32, use_validation=True,
        val_size=40, synthetic_n_train=400, seed=1,
    )
    chunks = loaders["train"]
    assert len(chunks) == 3
    assert sum(c.n for c in chunks) == 360
    assert loaders["test"].n == 40
    # chunks disjoint
    all_idx = np.concatenate([c.labels for c in chunks])
    assert len(all_idx) == 360


def test_stl10_remap_applied():
    # synthetic STL path also applies the class remap table
    x, y, synth = data.sources.load_raw("STL10", None, train=False)
    assert synth and set(np.unique(y)) <= set(range(10))


def test_metric_logger(tmp_path):
    import json

    from ursabench_tpu.logging_utils import MetricLogger, silent

    log = MetricLogger(str(tmp_path / "m.jsonl"))
    log.log({"loss": 1.5}, step=0)
    log.log({"loss": 1.2}, step=1)
    log.close()
    lines = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert lines[0]["loss"] == 1.5 and lines[1]["step"] == 1

    @silent
    def noisy():
        print("should not appear")
        return 7

    assert noisy() == 7


def test_image_folder_reader(tmp_path):
    from PIL import Image

    from ursabench_tpu.data.sources import read_image_folder

    for cls in ("cat", "dog"):
        d = tmp_path / cls / "images"
        d.mkdir(parents=True)
        for i in range(3):
            Image.new("RGB", (64, 64), color=(i * 40, 0, 0)).save(
                d / f"{i}.JPEG"
            )
    x, y = read_image_folder(str(tmp_path), 64)
    assert x.shape == (6, 64, 64, 3)
    assert list(np.bincount(y)) == [3, 3]  # cat=0, dog=1 (sorted)


def test_tin_synthetic_profile():
    from ursabench_tpu import data

    splits, C = data.loaders("TIN", None, batch_size=32, use_validation=False,
                             synthetic_n_train=64, synthetic_n_test=32)
    assert C == 200
    assert splits["train"].images.shape[1:] == (64, 64, 3)


def test_lsun_celeba_loaders(tmp_path):
    """LSUN/CelebA close the reference loader surface (datasets.py:165-168):
    synthetic fallback with the 10-class profile, and on-disk ImageFolder
    trees defining their own class count (max(targets)+1 semantics)."""
    from PIL import Image

    from ursabench_tpu import data

    for name in ("LSUN", "CelebA"):
        splits, C = data.loaders(name, None, batch_size=16, use_validation=False,
                                 synthetic_n_train=48, synthetic_n_test=16)
        assert C == 10
        assert splits["train"].images.shape[1:] == (64, 64, 3)

    # on-disk tree with 3 classes -> num_classes from disk, not the profile
    root = tmp_path / "lsun"
    for split in ("train", "test"):
        for cls in ("bedroom", "bridge", "tower"):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(2):
                Image.new("RGB", (64, 64), color=(i * 30, 10, 0)).save(
                    d / f"{i}.png"
                )
    splits, C = data.loaders("LSUN", str(root), batch_size=4,
                             use_validation=False)
    assert C == 3
    assert splits["train"].images.shape == (6, 64, 64, 3)


def test_image_folder_class_map_pinned_to_train(tmp_path):
    """train/ defines the class->id map for both splits; a test/ tree whose
    class set diverges errors instead of silently relabeling, and a partial
    LSUN export (real train, missing test) errors instead of pairing a
    k-class model with 10-class synthetic labels."""
    import pytest
    from PIL import Image

    from ursabench_tpu import data
    from ursabench_tpu.data.sources import read_split_image_folder

    root = tmp_path / "lsun"
    # train has {bedroom, kitchen}; test has an extra class
    for split, classes in (("train", ("bedroom", "kitchen")),
                           ("test", ("bedroom", "church", "kitchen"))):
        for cls in classes:
            d = root / split / cls
            d.mkdir(parents=True)
            Image.new("RGB", (64, 64), color=(5, 10, 0)).save(d / "0.png")
    x, y = read_split_image_folder(str(root), train=True, size=64)
    assert sorted(np.unique(y)) == [0, 1]
    with pytest.raises(ValueError, match="church"):
        read_split_image_folder(str(root), train=False, size=64)

    # partial export: train/ on disk, no test/ -> loud error, not silent mix
    root2 = tmp_path / "partial"
    d = root2 / "train" / "bedroom"
    d.mkdir(parents=True)
    Image.new("RGB", (64, 64)).save(d / "0.png")
    with pytest.raises(ValueError, match="synthetic"):
        data.loaders("LSUN", str(root2), batch_size=2, use_validation=False)


def test_empty_test_split_loads():
    from ursabench_tpu import data

    splits, C = data.loaders("MNIST", None, batch_size=8, use_validation=False,
                             synthetic_n_train=32, synthetic_n_test=0)
    assert splits["test"].n == 0 and C == 10


def test_synthetic_cache_not_aliased():
    """Mutating what synthetic() returned must never corrupt the on-disk
    cache for future loads."""
    from ursabench_tpu.data.sources import synthetic

    x, y = synthetic("MNIST", True, n=64)
    first_val = int(np.asarray(x[0]).max())
    try:
        np.asarray(x)[0] = 0  # read-only memmaps raise; plain arrays don't
    except ValueError:
        pass
    x2, _ = synthetic("MNIST", True, n=64)
    assert int(np.asarray(x2[0]).max()) == first_val


def test_ensemble_update_statistics_alias(small_ensemble_module=None):
    """_Task.ensemble_update_statistics (task_base.py:16) delegates to the
    vmapped update_statistics — the plural surface the reference declared
    but never implemented."""
    from ursabench_tpu import data, tasks
    from ursabench_tpu.inference.ensemble import Ensemble
    import jax

    from ursabench_tpu import models
    from ursabench_tpu.inference.engine import init_variables
    from ursabench_tpu.util import tree_stack

    splits, C = data.loaders("MNIST", None, batch_size=32, use_validation=False,
                             synthetic_n_train=64, synthetic_n_test=64)
    module = models.get_model("MLP200MNIST").build(C)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    variables = [init_variables(module, k, splits["test"].spec.shape) for k in keys]
    ens = Ensemble(module, tree_stack([v["params"] for v in variables]), None, 2)
    t1 = tasks.Prediction({"in_distribution_test": splits["test"]}, C,
                          metric_list=["error_rate", "nll"])
    t2 = tasks.Prediction({"in_distribution_test": splits["test"]}, C,
                          metric_list=["error_rate", "nll"])
    t1.update_statistics(ens, output_performance=False)
    t2.ensemble_update_statistics(ens, output_performance=False)
    assert t1.get_performance_metrics() == t2.get_performance_metrics()


def test_augment_normalized_padding_semantics():
    """Pad border must equal the normalized zero pixel; flips/crops preserve
    the multiset of interior values."""
    import jax
    import jax.numpy as jnp

    from ursabench_tpu.data.transforms import (
        CIFAR_TRAIN, augment_normalized, normalize,
    )

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    x = normalize(jnp.asarray(raw), CIFAR_TRAIN)
    out = np.asarray(augment_normalized(jax.random.PRNGKey(0), x, CIFAR_TRAIN))
    assert out.shape == x.shape
    pad_val = -np.asarray(CIFAR_TRAIN.mean) / np.asarray(CIFAR_TRAIN.std)
    # some shifted crops expose the pad border, and the border equals the
    # normalized zero pixel in ALL channels simultaneously
    near_pad = np.all(np.isclose(out, pad_val, atol=1e-4), axis=-1)
    assert near_pad.any()
    # non-pad pixels must come from the source image's value set (per channel)
    src0 = np.unique(np.round(np.asarray(x)[..., 0], 5))
    vals0 = np.round(out[~near_pad][:, 0], 5)
    matched = np.isin(vals0, src0) | np.isclose(vals0, pad_val[0], atol=1e-4)
    assert matched.mean() > 0.999


def test_augment_flip_fused_into_crop_is_bit_exact():
    """The column one-hot with per-image reversed targets must equal the
    naive crop-then-reverse composition exactly (selection einsums multiply
    by 1.0, so no tolerance is needed)."""
    import jax
    import jax.numpy as jnp

    from ursabench_tpu.data.transforms import CIFAR_TRAIN, augment

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(16, 32, 32, 3)), jnp.float32)
    key = jax.random.PRNGKey(7)
    out = np.asarray(augment(key, x, CIFAR_TRAIN, pad_value=0.0))

    # naive reference: same keys, crop via one-hots without fusion, then
    # reverse the flipped images afterwards
    p = CIFAR_TRAIN.random_crop_pad
    n, h, w, c = x.shape
    kx, ky = jax.random.split(key)
    kf = jax.random.fold_in(key, 1)
    flip = np.asarray(jax.random.bernoulli(kf, 0.5, (n,)))
    ox = np.asarray(jax.random.randint(kx, (n,), 0, 2 * p + 1))
    oy = np.asarray(jax.random.randint(ky, (n,), 0, 2 * p + 1))
    padded = np.zeros((n, h + 2 * p, w + 2 * p, c), np.float32)
    padded[:, p:-p, p:-p, :] = np.asarray(x)
    ref = np.stack([padded[i, ox[i]:ox[i] + h, oy[i]:oy[i] + w, :]
                    for i in range(n)])
    ref[flip] = ref[flip, :, ::-1, :]
    assert flip.any() and (~flip).any()  # both branches exercised
    np.testing.assert_array_equal(out, ref)


def test_augment_then_normalize_order_equivalence():
    """Order-equivalence of the two augmentation formulations: augmenting
    the raw-valued f32 batch with a zero border then normalizing equals
    normalize-then-augment_normalized exactly — one-hot selection is exact
    and normalize is affine with normalize(0) == the normalized-zero border.
    The SHIPPED epoch programs normalize BEFORE augmenting (engine
    .make_epoch_fn; the fused augment-then-normalize ordering was measured
    and reverted — see the epoch-body-micro-hoists note in CLAUDE.md); this
    test pins that both orderings are the same function, so the choice is
    purely a lowering/perf decision."""
    import jax
    import jax.numpy as jnp

    from ursabench_tpu.data.transforms import (
        CIFAR_TRAIN, augment, augment_normalized, normalize,
    )

    rng = np.random.default_rng(11)
    raw = jnp.asarray(rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(5)
    a = np.asarray(augment_normalized(key, normalize(raw, CIFAR_TRAIN),
                                      CIFAR_TRAIN))
    b = np.asarray(normalize(
        augment(key, raw.astype(jnp.float32), CIFAR_TRAIN, pad_value=0.0),
        CIFAR_TRAIN,
    ))
    np.testing.assert_array_equal(a, b)


def test_read_cifar_honors_requested_variant(tmp_path):
    """A shared data dir with BOTH CIFAR layouts must yield the requested one."""
    import pickle

    from ursabench_tpu.data.sources import read_cifar

    rng = np.random.default_rng(0)

    c10 = tmp_path / "cifar-10-batches-py"
    c10.mkdir()
    for i in range(1, 6):
        with open(c10 / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": rng.integers(0, 255, (4, 3072), dtype=np.uint8),
                         b"labels": [0, 1, 2, 3]}, f)
    with open(c10 / "test_batch", "wb") as f:
        pickle.dump({b"data": rng.integers(0, 255, (4, 3072), dtype=np.uint8),
                     b"labels": [4, 5, 6, 7]}, f)

    c100 = tmp_path / "cifar-100-python"
    c100.mkdir()
    for name in ("train", "test"):
        with open(c100 / name, "wb") as f:
            pickle.dump({b"data": rng.integers(0, 255, (4, 3072), dtype=np.uint8),
                         b"fine_labels": [97, 98, 99, 96]}, f)

    x10, y10 = read_cifar(str(tmp_path), train=True, variant=10)
    assert x10.shape == (20, 32, 32, 3) and y10.max() <= 9
    x100, y100 = read_cifar(str(tmp_path), train=True, variant=100)
    assert x100.shape == (4, 32, 32, 3) and y100.max() == 99


def test_synthetic_difficulty_knob():
    """The difficulty knob controls class separation monotonically: higher
    'separation' -> lower nearest-empirical-mean (Bayes proxy) error; the
    default operating point sits in the realistic band (not the 0%-error
    degenerate regime, not chance)."""
    from ursabench_tpu.data.sources import resolve_difficulty, synthetic

    def proxy_error(**diff):
        xtr, ytr = synthetic("MNIST", True, n=2048,
                             difficulty=diff or None)
        xte, yte = synthetic("MNIST", False, n=1024,
                             difficulty=diff or None)
        xtr = np.asarray(xtr).reshape(len(xtr), -1).astype(np.float32)
        xte = np.asarray(xte).reshape(len(xte), -1).astype(np.float32)
        means = np.stack([xtr[ytr == c].mean(0) for c in range(10)])
        pred = ((xte[:, None, :] - means[None]) ** 2).sum(-1).argmin(1)
        return float((pred != yte).mean())

    e_default = proxy_error()
    e_easy = proxy_error(separation=6.0)
    e_hard = proxy_error(separation=1.0)
    assert e_easy < e_default < e_hard
    assert 0.02 < e_default < 0.45, e_default  # realistic band
    assert e_hard > 0.4

    # per-dataset defaults resolve + caller overrides win + unknown rejected
    d = resolve_difficulty("CIFAR100")
    assert d["separation"] > resolve_difficulty("MNIST")["separation"]
    assert resolve_difficulty("MNIST", {"noise": 10.0})["noise"] == 10.0
    with pytest.raises(ValueError):
        resolve_difficulty("MNIST", {"nope": 1})

    # label noise: a Bayes-proxy-perfect split still has ~ln*(k-1)/k errors
    e_clean = proxy_error(separation=25.0, label_noise=0.0)
    e_noisy = proxy_error(separation=25.0, label_noise=0.1)
    assert e_clean < 0.01
    assert 0.04 < e_noisy < 0.16


def test_end_to_end_metrics_non_degenerate():
    """BASELINE-suite-style end-to-end run on the default synthetic
    difficulty must exercise the metric suite at realistic operating
    points: nonzero error, non-null misclass AUROC/AUCPR, ECE above the
    degenerate 1e-4 regime (VERDICT r2 'missing #2')."""
    import jax

    from ursabench_tpu import inference, models, tasks
    from ursabench_tpu import data as udata

    splits, C = udata.loaders("MNIST", None, batch_size=128,
                              use_validation=False,
                              synthetic_n_train=4096, synthetic_n_test=1024)
    module = models.get_model("MLP200MNIST").build(C)
    hyp = {"lr": 0.05, "prior_std": 1.0, "num_samples": 3, "alpha": 0.1,
           "burn_in_epochs": 3}
    ens = inference.SGHMC(hyp, model=module, train=splits["train"],
                          key=jax.random.PRNGKey(0)).sample()
    t = tasks.Prediction({"in_distribution_test": splits["test"]}, C,
                         metric_list="ALL")
    t.update_statistics(ens, output_performance=False)
    m = {k: float(v) for k, v in t.get_performance_metrics().items()}
    assert 0.03 < m["error_rate"] < 0.45, m["error_rate"]
    assert m["ece"] > 1e-3
    for k in ("misclass_model_uncertainty_auroc", "misclass_confidence_auroc",
              "misclass_total_uncertainty_auroc"):
        assert np.isfinite(m[k]) and 0.5 < m[k] <= 1.0, (k, m[k])
    for k in ("misclass_model_uncertainty_aucpr", "misclass_confidence_aucpr"):
        assert np.isfinite(m[k]) and m[k] > m["error_rate"] * 0.5, (k, m[k])


def test_synthetic_ood_pairs_share_base_geometry():
    """Same-shape datasets share the base image with a calibrated
    'base_shift' offset: after removing each dataset's global mean (the
    canon-stats affine deliberately separates dataset means, mirroring the
    real datasets' brightness differences), the distance from an OOD
    dataset's templates to the nearest ID template is comparable to in-
    distribution inter-class distances — the discriminative manifold
    geometry (sources._SYNTH_DIFFICULTY_DEFAULT). base_shift=0 collapses
    the shared-base component exactly."""
    from ursabench_tpu.data.sources import synthetic

    def ratio(shift):
        def tm(name):
            diff = {"base_shift": shift} if shift is not None else None
            x, y = synthetic(name, True, n=2048, difficulty=diff)
            x = np.asarray(x).reshape(len(x), -1).astype(np.float32)
            t = np.stack([x[y == c].mean(0) for c in range(10)])
            # remove the SCALAR dataset mean: the canon-mean offset is a
            # dataset-level property (test_synthetic_canon_stats); the
            # smooth shift/base/class fields (spatially zero-mean) survive
            return t - x.mean()

        t_id, t_ood = tm("MNIST"), tm("FashionMNIST")
        dd = np.linalg.norm(t_id[:, None] - t_id[None], axis=-1)
        intra = dd[np.triu_indices(10, 1)].mean()
        cross = np.linalg.norm(t_ood[:, None] - t_id[None],
                               axis=-1).min(1).mean()
        return float(cross / intra)

    # default geometry: nearest ID template at a comparable scale to the
    # in-distribution inter-class distances (measured v6: ~2.0)
    r_default = ratio(None)
    assert 0.5 < r_default < 3.0, r_default
    # base_shift is a live lever: a much larger shift pushes the OOD
    # manifold measurably farther (in units of in-dist class separation)
    assert ratio(5.0) > r_default * 1.03, (ratio(5.0), r_default)


def test_synthetic_canon_stats():
    """The synthetic fallback matches each dataset's canonical pixel
    moments, so the PROTOCOL transforms standardize it like real data:
    without this, MNIST-family synthetic data normalized by the real
    constants carried a +1.2 common-mode offset that collapsed
    momentum-SGMCMC training (measured: MLP/MNIST SGHMC lr .03 at 89.9%
    error; trains normally with matched stats)."""
    from ursabench_tpu.data.sources import _CANON_STATS, synthetic

    for name in ("MNIST", "KMNIST", "CIFAR10", "SVHN"):
        x, _ = synthetic(name, True, n=2048)
        xf = np.asarray(x, np.float32) / 255.0
        mean_t = np.asarray(_CANON_STATS[name][0])
        std_t = np.asarray(_CANON_STATS[name][1])
        offset = (xf.mean(axis=(0, 1, 2)) - mean_t) / std_t
        scale = xf.std(axis=(0, 1, 2)) / std_t
        # normalized offset ~0; scale within [0.6, 1.3] (dark datasets
        # can't reach full std under the [0,255] clip — the mean, which is
        # what hurts optimization, gets priority in the remap)
        assert np.all(np.abs(offset) < 0.15), (name, offset)
        assert np.all((0.6 < scale) & (scale < 1.3)), (name, scale)
