"""Native C++ data pipeline vs numpy reference."""

import numpy as np
import pytest

from ursabench_tpu.data import native
from ursabench_tpu.data.transforms import ImageSpec


def test_native_builds():
    assert native.native_available(), "libursa_dataio.so failed to build"


def test_permutation_is_permutation():
    p = native.permutation(1000, seed=42)
    assert sorted(p.tolist()) == list(range(1000))
    p2 = native.permutation(1000, seed=42)
    np.testing.assert_array_equal(p, p2)  # deterministic
    assert not np.array_equal(p, native.permutation(1000, seed=43))


def test_gather_normalize_matches_numpy():
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (50, 8, 8, 3), dtype=np.uint8)
    labels = rng.integers(0, 10, 50).astype(np.int64)
    idx = rng.permutation(50)[:16].astype(np.int64)
    mean = np.asarray([0.49, 0.48, 0.45], np.float32)
    std = np.asarray([0.2, 0.21, 0.19], np.float32)
    x, y = native.gather_normalize(images, labels, idx, mean, std)
    ref_x = (images[idx].astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(x, ref_x, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(y, labels[idx])


def test_gather_u8():
    rng = np.random.default_rng(1)
    images = rng.integers(0, 256, (20, 4, 4, 1), dtype=np.uint8)
    labels = rng.integers(0, 10, 20).astype(np.int64)
    idx = np.asarray([3, 1, 19], np.int64)
    x, y = native.gather_u8(images, labels, idx)
    np.testing.assert_array_equal(x, images[idx])
    np.testing.assert_array_equal(y, labels[idx])


def test_host_streaming_split():
    rng = np.random.default_rng(2)
    images = rng.integers(0, 256, (70, 8, 8, 1), dtype=np.uint8)
    labels = rng.integers(0, 10, 70).astype(np.int64)
    spec = ImageSpec(8, 1, (0.5,), (0.5,))
    split = native.HostStreamingSplit(images, labels, batch_size=32, spec=spec)
    batches = list(split.epoch())
    assert len(batches) == 2  # drops ragged tail
    x, y = batches[0]
    assert x.shape == (32, 8, 8, 1) and y.shape == (32,)
    # second epoch reshuffles
    b2 = list(split.epoch())
    assert not np.allclose(np.asarray(batches[0][0]), np.asarray(b2[0][0]))


def test_streaming_training_epoch():
    """Host-streamed SGHMC training: C++ gather/normalize feeding the
    single-batch jitted step; loss must decrease on separable data."""
    import jax
    import jax.numpy as jnp

    from ursabench_tpu import models
    from ursabench_tpu.data.sources import synthetic
    from ursabench_tpu.inference.engine import (
        TrainState, init_variables, make_streaming_step_fn,
        run_streaming_epoch,
    )
    from ursabench_tpu.inference.sgmcmc import _cosine_hyp_lr, _sghmc_hyp_update

    images, labels = synthetic("MNIST", train=True, n=256)
    spec = ImageSpec(28, 1, (0.1307,), (0.3081,))
    stream = native.HostStreamingSplit(images, labels, batch_size=64, spec=spec)

    module = models.get_model("MLP200MNIST").build(10)
    variables = init_variables(module, jax.random.PRNGKey(0), (28, 28, 1))
    state = TrainState(
        params=variables["params"],
        momentum=jax.tree.map(jnp.zeros_like, variables["params"]),
        batch_stats=variables.get("batch_stats", {}),
        key=jax.random.PRNGKey(1),
        step=jnp.zeros((), jnp.int32),
    )
    hyp = {
        "lr0": jnp.float32(0.05), "eta_min": jnp.float32(0.0),
        "t_max": jnp.float32(10.0), "momentum": jnp.float32(0.9),
        "wd_over_n": jnp.float32(1.0 / 256), "n_train": jnp.float32(256),
    }
    step = make_streaming_step_fn(module, lr_fn=_cosine_hyp_lr,
                                  update_fn=_sghmc_hyp_update, spec=spec)
    first_losses = None
    for epoch in range(10):
        state, losses = run_streaming_epoch(step, state, stream, epoch, 1.0, hyp)
        if first_losses is None:
            first_losses = losses
    # mean-of-epoch comparison: single-batch losses are noisy under the
    # always-on SGHMC Langevin noise
    last_mean = float(np.mean([float(l) for l in losses]))
    first_mean = float(np.mean([float(l) for l in first_losses]))
    assert last_mean < first_mean - 0.01, (last_mean, first_mean)


def test_streaming_from_disk_memmap(tmp_path):
    """HostStreamingSplit over a read-only np.load memmap: the C++ gather
    reads mapped pages directly — beyond-RAM datasets stream from disk."""
    import numpy as np

    from ursabench_tpu.data import native

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (40, 8, 8, 1), dtype=np.uint8)
    labels = rng.integers(0, 10, (40,)).astype(np.int64)
    p = tmp_path / "imgs.npy"
    np.save(p, images)
    mm = np.load(p, mmap_mode="r")
    assert not mm.flags.writeable

    spec = ImageSpec(8, 1, (0.5,), (0.5,))
    # default transfer_dtype='uint8': raw rows, device normalizes later
    split = native.HostStreamingSplit(mm, labels, batch_size=16, spec=spec,
                                      shuffle=False)
    batches = list(split.epoch())
    assert len(batches) == 2
    x0 = np.asarray(batches[0][0])
    assert x0.dtype == np.uint8
    np.testing.assert_array_equal(x0, images[:16])
    np.testing.assert_array_equal(np.asarray(batches[0][1]), labels[:16])
    # float32 mode: the C++ fused gather+normalize
    split = native.HostStreamingSplit(mm, labels, batch_size=16, spec=spec,
                                      shuffle=False, transfer_dtype="float32")
    x0 = np.asarray(next(iter(split.epoch()))[0])
    ref = (images[:16].astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(x0, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("transfer_dtype", ["uint8", "float32"])
def test_prefetch_stream_covers_epoch_and_matches_reference(transfer_dtype):
    """The C++ background-prefetch stream (worker thread + ring buffer)
    yields every batch of a shuffled epoch exactly once, with contents
    equal to the reference gather of the same indices — raw rows in uint8
    mode (normalize-on-device), fused gather+normalize in float32 mode."""
    assert native.native_available()
    rng = np.random.default_rng(0)
    n, h, w, c = 130, 8, 8, 3
    images = rng.integers(0, 255, (n, h, w, c), dtype=np.uint8)
    labels = np.arange(n, dtype=np.int64)  # labels reveal gathered indices
    from ursabench_tpu.data.transforms import ImageSpec

    spec = ImageSpec(h, c, (0.5, 0.4, 0.3), (0.2, 0.25, 0.3))
    split = native.HostStreamingSplit(images, labels, batch_size=32,
                                      spec=spec, seed=7,
                                      transfer_dtype=transfer_dtype)
    seen = []
    for x, y in split.epoch():
        x, y = np.asarray(x), np.asarray(y)
        assert x.shape == (32, h, w, c) and y.shape == (32,)
        if transfer_dtype == "uint8":
            assert x.dtype == np.uint8
            np.testing.assert_array_equal(x, images[y])
        else:
            ref = (images[y].astype(np.float32) / 255.0
                   - np.asarray(spec.mean)) / np.asarray(spec.std)
            np.testing.assert_allclose(x, ref, rtol=1e-5, atol=1e-6)
        seen.extend(y.tolist())
    assert len(seen) == 4 * 32  # 130 // 32 batches
    assert len(set(seen)) == len(seen)  # no index twice (one epoch)

    # second epoch reshuffles
    seen2 = [int(v) for _, y in split.epoch() for v in np.asarray(y)]
    assert seen2 != seen
    assert len(set(seen2)) == len(seen2)


def test_sampler_trains_from_streaming_split():
    """Any epoch-driven sampler accepts a HostStreamingSplit as its train
    split: make_epoch_fn routes epochs through the C++ prefetch stream +
    single-batch jitted step with the same traced-hyp contract."""
    import jax

    from ursabench_tpu import inference, models
    from ursabench_tpu.data.sources import synthetic
    from ursabench_tpu.data.transforms import ImageSpec

    images, labels = synthetic(
        "MNIST", train=True, n=256,
        difficulty={"separation": 25.0, "label_noise": 0.0},
    )
    spec = ImageSpec(28, 1, (0.1307,), (0.3081,))
    stream = native.HostStreamingSplit(np.asarray(images), labels,
                                       batch_size=64, spec=spec)
    module = models.get_model("MLP200MNIST").build(10)
    s = inference.SGLD(
        {"lr": 0.05, "prior_std": 1.0, "num_samples": 2, "burn_in_epochs": 3},
        model=module, train=stream, key=jax.random.PRNGKey(0),
    )
    ens = s.sample()
    assert ens.num_members == 2
    # traced-hyp contract: update_hyp reuses the compiled streaming step
    n_compiles = s._epoch_fn._cache_size()
    s.update_hyp({"lr": 0.01, "prior_std": 0.5, "num_samples": 1,
                  "burn_in_epochs": 0})
    s.sample()
    assert s._epoch_fn._cache_size() == n_compiles
    # multi-chain / mesh are rejected for streaming splits
    try:
        inference.SGLD({"lr": 0.05, "prior_std": 1.0, "num_samples": 1,
                        "burn_in_epochs": 0},
                       model=module, train=stream,
                       key=jax.random.PRNGKey(0), chains=2)
        assert False, "expected assertion for chains>1 streaming"
    except AssertionError as e:
        assert "single-chain" in str(e)


def test_chunked_epoch_contents_and_ring_reuse():
    """chunk_batches=M stages M batches per transfer as (M, B, ...) device
    arrays; contents must equal the per-batch stream's (same seed => same
    permutation), across MULTIPLE epochs (exercises ursa_stream_reset +
    staging-ring slot reuse: more transfers than ring slots)."""
    rng = np.random.default_rng(3)
    n, h, w, c = 256, 8, 8, 3
    images = rng.integers(0, 256, (n, h, w, c), dtype=np.uint8)
    labels = np.arange(n, dtype=np.int64)  # labels reveal gathered indices
    spec = ImageSpec(h, c, (0.5, 0.4, 0.3), (0.2, 0.25, 0.3))
    chunked = native.HostStreamingSplit(images, labels, batch_size=16,
                                        spec=spec, seed=11, chunk_batches=4)
    flat = native.HostStreamingSplit(images, labels, batch_size=16,
                                     spec=spec, seed=11)
    assert chunked.num_chunks == 4 and chunked.num_batches == 16
    for _ in range(3):  # 3 epochs: reset path + ring laps (4 chunks > 3 slots)
        ref = [(np.asarray(x), np.asarray(y)) for x, y in flat.epoch()]
        got = list(chunked.epoch())
        assert len(got) == 4
        for ci, (x, y) in enumerate(got):
            x, y = np.asarray(x), np.asarray(y)
            assert x.shape == (4, 16, h, w, c) and y.shape == (4, 16)
            assert x.dtype == np.uint8
            for j in range(4):
                rx, ry = ref[ci * 4 + j]
                np.testing.assert_array_equal(x[j], rx)
                np.testing.assert_array_equal(y[j], ry)
                np.testing.assert_array_equal(x[j], images[ry])


def test_chunked_streamed_training_matches_per_batch():
    """The chunked scan must train BIT-IDENTICALLY to the per-batch streamed
    path: same permutation (same seed), same per-step RNG split sequence,
    same global batch index fed to the lr schedule."""
    import jax
    import jax.numpy as jnp

    from ursabench_tpu import models
    from ursabench_tpu.data.sources import synthetic
    from ursabench_tpu.inference.engine import (
        TrainState, init_variables, make_epoch_fn,
    )
    from ursabench_tpu.inference.sgmcmc import _cosine_hyp_lr, _sghmc_hyp_update

    images, labels = synthetic("MNIST", train=True, n=192)
    spec = ImageSpec(28, 1, (0.1307,), (0.3081,))
    module = models.get_model("MLP200MNIST").build(10)
    hyp = {
        "lr0": jnp.float32(0.05), "eta_min": jnp.float32(0.0),
        "t_max": jnp.float32(10.0), "momentum": jnp.float32(0.9),
        "wd_over_n": jnp.float32(1.0 / 192), "n_train": jnp.float32(192),
    }

    def run(split):
        variables = init_variables(module, jax.random.PRNGKey(0), (28, 28, 1))
        state = TrainState(
            params=variables["params"],
            momentum=jax.tree.map(jnp.zeros_like, variables["params"]),
            batch_stats=variables.get("batch_stats", {}),
            key=jax.random.PRNGKey(1),
            step=jnp.zeros((), jnp.int32),
        )
        epoch_fn = make_epoch_fn(
            module, split, lr_fn=_cosine_hyp_lr, update_fn=_sghmc_hyp_update,
            use_augment=False,
        )
        for epoch in range(2):
            state, loss = epoch_fn(state, jnp.asarray(float(epoch)),
                                   jnp.asarray(1.0), hyp)
        return state, loss

    imgs = np.asarray(images)
    s_flat, l_flat = run(native.HostStreamingSplit(
        imgs, labels, batch_size=32, spec=spec, seed=5))
    s_chunk, l_chunk = run(native.HostStreamingSplit(
        imgs, labels, batch_size=32, spec=spec, seed=5, chunk_batches=3))
    for a, b in zip(jax.tree.leaves(s_flat.params),
                    jax.tree.leaves(s_chunk.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(float(l_flat), float(l_chunk), rtol=1e-5)
