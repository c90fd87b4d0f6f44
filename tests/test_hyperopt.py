"""Hyperopt: GP sanity, RandomSearch/GridSearch/BayesOpt over a toy sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ursabench_tpu.hyperopt import GP, BayesOpt, GridSearch, RandomSearch
from ursabench_tpu.hyperopt.gp import init_params


def test_gp_fit_and_posterior():
    rng = np.random.default_rng(0)
    x = rng.uniform(-2, 2, (30, 1))
    y = np.sin(2 * x[:, 0]) + 0.05 * rng.normal(size=30)
    gp = GP(x, y)
    xq = np.linspace(-2, 2, 50)[:, None]
    from ursabench_tpu.hyperopt.gp import posterior, standardize

    mean, std = posterior(gp.params, gp.x, gp.y, jnp.asarray(xq, jnp.float32))
    target = np.asarray(standardize(jnp.asarray(np.sin(2 * xq[:, 0]), jnp.float32)))
    # GP mean should track the (standardized) function shape
    corr = np.corrcoef(np.asarray(mean), np.sin(2 * xq[:, 0]))[0, 1]
    assert corr > 0.95
    assert np.all(np.asarray(std) >= 0)


class _QuadraticInference:
    """Toy 'sampler' whose objective is -(lr - 0.03)^2 - (p - 1)^2."""

    def __init__(self):
        self.hyp = None

    def update_hyp(self, hyp):
        self.hyp = hyp

    def sample(self):
        return self.hyp


class _QuadraticTask:
    def reset(self):
        pass

    def update_statistics(self, hyp, output_performance=True):
        return -(np.log(hyp["lr"]) - np.log(0.03)) ** 2 - (hyp["prior_std"] - 1.0) ** 2


DOMAIN = [
    {"name": "lr", "type": "continuous", "domain": (1e-3, 1.0), "option": "logspace"},
    {"name": "prior_std", "type": "continuous", "domain": (0.1, 3.0), "option": "linspace"},
    {"name": "num_samples", "type": "constant", "domain": 3},
]


def test_random_search():
    rs = RandomSearch(_QuadraticTask(), DOMAIN, _QuadraticInference(),
                      N_evaluations=20, seed=0)
    best_hyp, best_obj = rs.run()
    assert best_hyp["num_samples"] == 3
    assert 1e-3 <= best_hyp["lr"] <= 1.0
    assert best_obj > -3.0


def test_grid_search():
    gs = GridSearch(_QuadraticTask(), DOMAIN, _QuadraticInference(),
                    grid_size=[5, 5, 1], seed=0)
    best_hyp, best_obj = gs.run()
    assert len(gs.time) == 25
    assert best_obj > -1.0


def test_bayesopt_improves_over_init():
    bo = BayesOpt(_QuadraticTask(), DOMAIN, _QuadraticInference(),
                  N_evaluations=8, init_evaluations=3, seed=0)
    best_hyp, best_obj, hyps, trace = bo.run(
        return_all=1, initialisation="RandomSearch"
    )
    assert best_obj >= trace[0] - 1e-9
    assert best_obj > -0.5  # converges near optimum on this smooth toy
    assert "num_samples" in best_hyp


def test_bayesopt_discrete_and_checkpoint(tmp_path):
    domain = DOMAIN[:2] + [
        {"name": "burn", "type": "discrete", "domain": (1, 10), "option": "linspace"},
    ]

    class T(_QuadraticTask):
        def update_statistics(self, hyp, output_performance=True):
            assert isinstance(hyp["burn"], int)
            return super().update_statistics(hyp)

    bo = BayesOpt(T(), domain, _QuadraticInference(), N_evaluations=3,
                  init_evaluations=2, seed=1)
    best_hyp, _ = bo.run(initialisation="RandomSearch",
                         save_path=str(tmp_path / "best"))
    assert (tmp_path / "best.json").exists()
    assert isinstance(best_hyp["burn"], int)


def test_bayesopt_survives_diverged_configs():
    """Non-finite objectives must not poison the GP (sanitized as very-bad)."""

    class ExplodingInference(_QuadraticInference):
        pass

    class ExplodingTask(_QuadraticTask):
        def update_statistics(self, hyp, output_performance=True):
            if hyp["lr"] > 0.1:  # "diverges"
                return float("nan")
            return super().update_statistics(hyp)

    bo = BayesOpt(ExplodingTask(), DOMAIN, ExplodingInference(),
                  N_evaluations=4, init_evaluations=3, seed=3)
    best_hyp, best_obj = bo.run(initialisation="RandomSearch")
    assert np.isfinite(best_obj)
    assert best_hyp["lr"] <= 0.1


def test_sanitize_targets():
    from ursabench_tpu.hyperopt.bayesopt import sanitize_targets

    y = np.array([1.0, float("nan"), 3.0, float("-inf")])
    out = sanitize_targets(y)
    assert np.isfinite(out).all()
    assert out[1] == out[3] == 1.0 - 2.0 - 1.0
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        sanitize_targets(np.array([float("nan")]))


def test_run_hypopt_parallel_dry_run(tmp_path, monkeypatch):
    import json as _json

    from ursabench_tpu.run_hypopt import main_par

    domain_path = tmp_path / "domain.json"
    domain_path.write_text(_json.dumps([
        {"name": "lr", "type": "continuous", "domain": [0.001, 0.1],
         "option": "logspace"},
        {"name": "prior_std", "type": "constant", "domain": 1.0},
        {"name": "num_samples", "type": "constant", "domain": 2},
        {"name": "burn_in_epochs", "type": "constant", "domain": 1},
    ]))
    monkeypatch.chdir(tmp_path)
    cmds = main_par([
        "--domain_path", str(domain_path), "--dataset", "MNIST",
        "--model", "MLP200MNIST", "--inference_method", "SGLD",
        "--N_evaluations", "3", "--dry_run",
        "--synthetic_n_train", "96", "--synthetic_n_test", "32",
    ])
    assert len(cmds) == 3
    for c in cmds:
        assert c[:3] == ["python", "-m", "ursabench_tpu.experiment"]
        assert "--use_val" in c
        hyp = _json.loads(c[c.index("--hyperparams") + 1])
        assert 0.001 <= hyp["lr"] <= 0.1
