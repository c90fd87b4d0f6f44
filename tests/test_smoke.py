"""End-to-end smoke: SGLD/SGHMC on tiny synthetic MNIST -> Prediction metrics."""

import numpy as np
import pytest

from ursabench_tpu import data, inference, models, tasks


def _mlp_module(num_classes):
    return models.get_model("MLP200MNIST").build(num_classes)


def test_sgld_prediction_end_to_end(tiny_mnist):
    import jax

    splits, num_classes = tiny_mnist
    module = _mlp_module(num_classes)
    hyp = {"lr": 0.01, "prior_std": 1.0, "num_samples": 3, "burn_in_epochs": 2}
    sampler = inference.SGLD(
        hyp, model=module, train=splits["train"], key=jax.random.PRNGKey(0)
    )
    ens = sampler.sample()
    assert ens.num_members == 3

    task = tasks.Prediction(
        {"in_distribution_test": splits["test"]}, num_classes, metric_list="ALL"
    )
    task.update_statistics(ens, output_performance=False)
    m = task.get_performance_metrics()
    assert set(m) == set(tasks.Prediction.supported_metric_list)
    assert 0.0 <= m["error_rate"] <= 1.0
    assert m["nll"] == pytest.approx(-m["ll"])
    assert 0.0 <= m["ece"] <= 1.0
    assert np.isfinite(m["brier_score"])
    for k, v in m.items():
        assert np.isfinite(v), k


def test_sghmc_multichain(tiny_mnist):
    import jax

    splits, num_classes = tiny_mnist
    module = _mlp_module(num_classes)
    hyp = {"lr": 0.01, "prior_std": 1.0, "num_samples": 2, "alpha": 0.1,
           "burn_in_epochs": 1}
    sampler = inference.SGHMC(
        hyp, model=module, train=splits["train"], key=jax.random.PRNGKey(1),
        chains=2,
    )
    ens = sampler.sample()
    assert ens.num_members == 4  # 2 draws x 2 chains

    # chains must differ (different PRNG streams)
    p = jax.tree.leaves(ens.params)[0]
    assert not np.allclose(np.asarray(p[0]), np.asarray(p[1]))


def test_chain_strategy_scan_matches_vmap(tiny_mnist):
    """chains advanced by lax.scan produce the same per-chain draws as the
    vmapped epoch (the throughput strategies are numerically equivalent)."""
    import jax

    splits, num_classes = tiny_mnist
    module = _mlp_module(num_classes)
    hyp = {"lr": 0.01, "prior_std": 1.0, "num_samples": 2, "alpha": 0.1,
           "burn_in_epochs": 1}

    def run(strategy):
        s = inference.SGHMC(
            hyp, model=module, train=splits["train"],
            key=jax.random.PRNGKey(3), chains=2, chain_strategy=strategy,
        )
        assert s._epoch_fn._chain_strategy == strategy
        s._run_epoch(noise_on=True)
        return s._state

    st_v = run("vmap")
    st_s = run("scan")
    for a, b in zip(jax.tree.leaves(st_v.params), jax.tree.leaves(st_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_chain_strategy_auto_rule(tiny_mnist):
    """auto = scan iff the model has conv kernels (grouped-convolution
    pathology under weight-vmap); dense models keep the vmapped epoch."""
    import jax

    from ursabench_tpu.inference.engine import make_epoch_fn

    splits, num_classes = tiny_mnist
    mlp_fn = inference.SGHMC(
        {"lr": 0.01, "prior_std": 1.0, "num_samples": 2, "alpha": 0.1,
         "burn_in_epochs": 1},
        model=_mlp_module(num_classes), train=splits["train"],
        key=jax.random.PRNGKey(0), chains=2,
    )._epoch_fn
    assert mlp_fn._chain_strategy == "vmap"

    conv_splits, C = data.loaders(
        "CIFAR10", None, batch_size=16, use_validation=False,
        synthetic_n_train=32, synthetic_n_test=16,
    )
    conv = models.get_model("PreResNet8").build(C)
    conv_fn = make_epoch_fn(
        conv, conv_splits["train"],
        lr_fn=lambda hyp, e, b, s: hyp["lr0"],
        update_fn=None, chains=2,
    )  # jit is lazy: building the fn never compiles
    assert conv_fn._chain_strategy == "scan"


def test_csghmc_harvest_schedule(tiny_mnist):
    import jax

    splits, num_classes = tiny_mnist
    module = _mlp_module(num_classes)
    hyp = {"lr_0": 0.01, "prior_std": 1.0, "num_samples_per_cycle": 2,
           "cycle_length": 5, "burn_in_epochs": 1, "num_cycles": 2, "alpha": 0.5}
    sampler = inference.cSGHMC(
        hyp, model=module, train=splits["train"], key=jax.random.PRNGKey(2)
    )
    ens = sampler.sample()
    assert ens.num_members == 4
    # harvests happen in the last 2 epochs of each 5-epoch cycle
    assert sampler.epochs_run == 10
