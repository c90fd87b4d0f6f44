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
