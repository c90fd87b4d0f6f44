"""OOD / Decision / distilled task behavior on tiny synthetic data."""

import numpy as np
import pytest

from ursabench_tpu import data, inference, models, tasks


@pytest.fixture(scope="module")
def small_ensemble():
    import jax

    # near-separable difficulty (see tests/test_samplers.py tiny fixture)
    splits, C = data.loaders(
        "MNIST", None, batch_size=32, use_validation=False,
        synthetic_n_train=128, synthetic_n_test=64,
        difficulty={"separation": 25.0, "label_noise": 0.0},
    )
    module = models.get_model("MLP200MNIST").build(C)
    hyp = {"lr": 0.03, "prior_std": 1.0, "num_samples": 4, "burn_in_epochs": 3}
    ens = inference.SGLD(
        hyp, model=module, train=splits["train"], key=jax.random.PRNGKey(0)
    ).sample()
    return splits, C, module, ens


def test_ood_detection(small_ensemble):
    splits, C, module, ens = small_ensemble
    ood_splits, _ = data.loaders(
        "FashionMNIST", None, batch_size=32, use_validation=False,
        synthetic_n_train=64, synthetic_n_test=64,
    )
    task = tasks.OODDetection(
        {
            "in_distribution_test": splits["test"],
            "out_distribution_test": ood_splits["test"],
        },
        num_classes=C,
    )
    m = task.update_statistics(ens, output_performance=True)
    assert set(m) == {"total_uncertainty_auroc", "model_uncertainty_auroc"}
    assert 0.0 <= m["total_uncertainty_auroc"] <= 1.0
    # trained on in-dist templates => OOD should be detectable
    assert m["total_uncertainty_auroc"] > 0.5


def test_decision_task(small_ensemble):
    splits, C, module, ens = small_ensemble
    task = tasks.Decision({"decision_data_test": splits["test"]}, num_classes=C)
    m = task.update_statistics(ens, output_performance=True)
    assert m["True_Cost"] >= 0.0
    assert m["Decision"].shape == (splits["test"].n,)
    # cost matrix shape sanity: MNIST rows 3,7 are expensive
    assert task.cost_mat[3, 0] == 100.0 and task.cost_mat[0, 3] == 0.1
    assert np.all(np.diag(task.cost_mat) == 0)


def test_decision_cost_formula():
    from ursabench_tpu.tasks.decision import decision_cost, mnist_cost

    cm = mnist_cost(10)
    y = np.array([3, 7, 0, 1])
    d = np.array([3, 0, 0, 2])
    # cost = 0 (correct) + 100 (missed 7) + 0 + 0.1
    assert decision_cost(d, y, cm) == pytest.approx(100.1)


def test_latency_mode_metric_equivalence(small_ensemble):
    """latency_mode accumulates through a per-batch host loop
    (prediction.py _accumulate_timed) while the fast path is one jitted
    scan (accumulate_split) — the two implementations must produce the
    same metrics, or a drift would go unnoticed."""
    from ursabench_tpu.tasks.base import accumulate_split

    splits, C, _, ens = small_ensemble
    fast = tasks.Prediction({"in_distribution_test": splits["test"]}, C,
                            metric_list="ALL")
    timed = tasks.Prediction({"in_distribution_test": splits["test"]}, C,
                             metric_list="ALL", latency_mode=True)
    # the two accumulator implementations agree to float noise
    p_fast, e_fast = accumulate_split(ens, splits["test"], smooth_probs=False)
    p_timed, e_timed = timed._accumulate_timed(ens)
    np.testing.assert_allclose(p_fast, p_timed, atol=1e-5)
    np.testing.assert_allclose(e_fast, e_timed, atol=1e-5)
    timed.latencies.clear()

    fast.update_statistics(ens, output_performance=False)
    timed.update_statistics(ens, output_performance=False)
    m_fast = fast.get_performance_metrics()
    m_timed = timed.get_performance_metrics()
    assert len(timed.latencies) == -(-splits["test"].n // splits["test"].batch_size)
    for k, v in m_fast.items():
        # rank metrics flip ties under 1e-7 prob noise on the tiny fixture;
        # a structural drift (e.g. smoothing applied differently) moves them
        # by far more than 0.05
        tol = 0.05 if k.endswith(("auroc", "aucpr")) else 1e-5
        if np.isnan(v):
            assert np.isnan(m_timed[k]), k
        else:
            assert abs(v - m_timed[k]) < tol, (k, v, m_timed[k])


def test_distilled_tasks(small_ensemble):
    import flax.linen as nn
    import jax

    splits, C, module, ens = small_ensemble

    class EntropyHead(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = x.reshape((x.shape[0], -1))
            return nn.Dense(1)(x)

    unc = EntropyHead()
    unc_vars = unc.init(jax.random.PRNGKey(0), np.zeros((1, 28, 28, 1), np.float32))
    pair = tasks.DistilledPair(
        pred_module=module, pred_variables=ens.member(0),
        unc_module=unc, unc_variables=unc_vars,
    )
    pred = tasks.PredictionDistilled(
        {"in_distribution_test": splits["test"]}, C, metric_list=["error_rate", "nll"]
    )
    m = pred.update_statistics(pair, output_performance=False) or \
        pred.get_performance_metrics()
    assert 0 <= m["error_rate"] <= 1

    ood_splits, _ = data.loaders(
        "KMNIST", None, batch_size=32, use_validation=False,
        synthetic_n_train=64, synthetic_n_test=64,
    )
    ood = tasks.OODDetectionDistilled(
        {
            "in_distribution_test": splits["test"],
            "out_distribution_test": ood_splits["test"],
        },
        num_classes=C,
    )
    mo = ood.update_statistics(pair, output_performance=True)
    assert 0.0 <= mo["model_uncertainty_auroc"] <= 1.0


def test_distillation_end_to_end(small_ensemble):
    import flax.linen as nn
    import jax

    from ursabench_tpu.inference import distill_ensemble

    splits, C, module, ens = small_ensemble

    class EntropyHead(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = x.reshape((x.shape[0], -1))
            return nn.Dense(1)(nn.tanh(nn.Dense(32)(x)))

    # distill onto a fresh copy of the same architecture + a small head
    splits_tr = splits["train"]
    pair = distill_ensemble(
        ens, splits_tr, module, EntropyHead(), epochs=15, lr=2e-3,
        key=jax.random.PRNGKey(0),
    )
    pred = tasks.PredictionDistilled(
        {"in_distribution_test": splits["test"]}, C,
        metric_list=["error_rate", "nll"],
    )
    pred.update_statistics(pair, output_performance=False)
    m = pred.get_performance_metrics()
    # the distilled predictor should roughly track the ensemble (both learn
    # the separable synthetic data)
    full = tasks.Prediction(
        {"in_distribution_test": splits["test"]}, C, metric_list=["error_rate"]
    )
    full.update_statistics(ens, output_performance=False)
    ens_err = full.get_performance_metrics()["error_rate"]
    assert m["error_rate"] <= ens_err + 0.2
