"""Vectorized multi-config SGHMC sweep."""

import jax
import numpy as np

from ursabench_tpu import data, inference, models, tasks
from ursabench_tpu.hyperopt import vectorized_random_search
from ursabench_tpu.inference.vectorized import SGHMCSweep


def _setup():
    splits, C = data.loaders(
        "MNIST", None, batch_size=32, use_validation=False,
        synthetic_n_train=128, synthetic_n_test=64,
    )
    module = models.get_model("MLP200MNIST").build(C)
    return splits, C, module


def test_sweep_matches_config_count():
    splits, C, module = _setup()
    hyps = [
        {"lr": lr, "prior_std": 1.0, "alpha": 0.1, "num_samples": 2,
         "burn_in_epochs": 1}
        for lr in (0.001, 0.03, 0.3)
    ]
    sweep = SGHMCSweep(hyps, model=module, train=splits["train"],
                       key=jax.random.PRNGKey(0))
    ensembles = sweep.sample()
    assert len(ensembles) == 3
    assert all(e.num_members == 2 for e in ensembles)
    # different lrs produce different parameters
    a = np.asarray(jax.tree.leaves(ensembles[0].params)[0])
    b = np.asarray(jax.tree.leaves(ensembles[2].params)[0])
    assert not np.allclose(a, b)


def test_sweep_objectives_pick_sane_lr():
    splits, C, module = _setup()

    def task_factory():
        return tasks.Prediction(
            {"in_distribution_test": splits["test"]}, C, metric_list=["ll"]
        )

    domain = [
        {"name": "lr", "type": "continuous", "domain": (1e-4, 0.3),
         "option": "logspace"},
        {"name": "prior_std", "type": "continuous", "domain": (0.5, 2.0),
         "option": "linspace"},
        {"name": "alpha", "type": "constant", "domain": 0.1},
        {"name": "num_samples", "type": "constant", "domain": 2},
        {"name": "burn_in_epochs", "type": "constant", "domain": 2},
    ]
    best_hyp, best_obj, hyps, objs = vectorized_random_search(
        domain, module, splits["train"], task_factory, N_evaluations=6, seed=0
    )
    assert len(objs) == 6
    assert best_obj == max(objs)
    assert 1e-4 <= best_hyp["lr"] <= 0.3
    # the best config should actually have learned something
    assert best_obj > min(objs)


def test_batched_bayesopt():
    from ursabench_tpu.hyperopt import batched_bayesopt_sghmc

    splits, C, module = _setup()

    def task_factory():
        return tasks.Prediction(
            {"in_distribution_test": splits["test"]}, C, metric_list=["ll"]
        )

    domain = [
        {"name": "lr", "type": "continuous", "domain": (1e-4, 0.3),
         "option": "logspace"},
        {"name": "prior_std", "type": "constant", "domain": 1.0},
        {"name": "alpha", "type": "constant", "domain": 0.1},
        {"name": "num_samples", "type": "constant", "domain": 2},
        {"name": "burn_in_epochs", "type": "constant", "domain": 1},
    ]
    best_hyp, best_obj, hyps, objs = batched_bayesopt_sghmc(
        domain, module, splits["train"], task_factory,
        rounds=2, q=3, init_evaluations=3, seed=0,
    )
    assert len(objs) == 3 + 2 * 3
    assert best_obj == max(objs)
    assert 1e-4 <= best_hyp["lr"] <= 0.3


def test_method_sweep_csghmc_matches_individual_samplers():
    """A cSGHMC MethodSweep (K configs in one vmap_hyp epoch program) must
    reproduce each config's INDIVIDUAL cSGHMC run exactly: same per-config
    keys -> same init, same permutation/noise streams, same cyclic-LR and
    harvest schedule. Parity here certifies the whole generalized-sweep
    plumbing (stacked states, vectorized traced hypers, protocol driving)."""
    splits, C, module = _setup()
    hyps = [
        {"lr_0": lr, "prior_std": 1.0, "num_samples_per_cycle": 1,
         "cycle_length": 3, "burn_in_epochs": 1, "num_cycles": 2,
         "alpha": 0.3}
        for lr in (0.01, 0.05)
    ]
    key = jax.random.PRNGKey(3)
    sweep = inference.MethodSweep(hyps, model=module, train=splits["train"],
                                  key=key, method="cSGHMC")
    ensembles = sweep.sample()
    assert len(ensembles) == 2 and all(e.num_members == 2 for e in ensembles)

    keys = jax.random.split(key, 2)
    for k, (h, kk) in enumerate(zip(hyps, keys)):
        solo = inference.cSGHMC(dict(h), model=module, train=splits["train"],
                                key=kk)
        ens = solo.sample()
        for a, b in zip(jax.tree.leaves(ensembles[k].params),
                        jax.tree.leaves(ens.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-6)


def test_method_sweep_sgd_and_random_search_method():
    """SGD sweeps through the same machinery, and vectorized_random_search
    routes an arbitrary inference_method."""
    splits, C, module = _setup()
    hyps = [{"lr": lr, "epochs": 2, "momentum": 0.9, "weight_decay": 1e-4}
            for lr in (0.01, 0.1)]
    sweep = inference.MethodSweep(hyps, model=module, train=splits["train"],
                                  key=jax.random.PRNGKey(0), method="SGD")
    ensembles = sweep.sample()
    assert len(ensembles) == 2 and all(e.num_members == 1 for e in ensembles)
    a = np.asarray(jax.tree.leaves(ensembles[0].params)[0])
    b = np.asarray(jax.tree.leaves(ensembles[1].params)[0])
    assert not np.allclose(a, b)

    def task_factory():
        return tasks.Prediction(
            {"in_distribution_test": splits["test"]}, C, metric_list=["ll"]
        )

    domain = [
        {"name": "lr_0", "type": "continuous", "domain": (1e-3, 0.1),
         "option": "logspace"},
        {"name": "prior_std", "type": "constant", "domain": 1.0},
        {"name": "alpha", "type": "constant", "domain": 0.3},
        {"name": "num_samples_per_cycle", "type": "constant", "domain": 1},
        {"name": "cycle_length", "type": "constant", "domain": 3},
        {"name": "burn_in_epochs", "type": "constant", "domain": 1},
        {"name": "num_cycles", "type": "constant", "domain": 1},
    ]
    best_hyp, best_obj, hyps2, objs = vectorized_random_search(
        domain, module, splits["train"], task_factory, N_evaluations=3,
        seed=0, inference_method="cSGHMC",
    )
    assert len(objs) == 3 and best_obj == max(objs)
    # schedule-shape mismatch across configs is rejected
    bad = [dict(hyps[0]), {**hyps[1], "epochs": 5}]
    try:
        inference.MethodSweep(bad, model=module, train=splits["train"],
                              key=jax.random.PRNGKey(0), method="SGD")
        assert False, "expected shared-schedule assertion"
    except AssertionError as e:
        assert "burn_in_epochs" in str(e)


def test_method_sweep_scan_strategy_matches_vmap():
    """chain_strategy='scan' advances the K configs sequentially inside one
    lax.scan (each under ITS OWN hyp dict — the vmap_hyp branch of the scan
    body) and reproduces the vmapped sweep's parameters exactly."""
    from ursabench_tpu.inference.vectorized import MethodSweep

    splits, C, module = _setup()
    hyps = [
        {"lr": lr, "prior_std": 1.0, "alpha": 0.1, "num_samples": 2,
         "burn_in_epochs": 1}
        for lr in (0.01, 0.1)
    ]

    def run(strategy):
        sweep = MethodSweep(hyps, model=module, train=splits["train"],
                            key=jax.random.PRNGKey(4), method="SGHMC",
                            chain_strategy=strategy)
        for _ in range(2):
            sweep._run_epoch(noise_on=True)
        return sweep._state

    st_v = run("vmap")
    st_s = run("scan")
    for a, b in zip(jax.tree.leaves(st_v.params), jax.tree.leaves(st_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
