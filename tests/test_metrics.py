"""Metric parity vs sklearn / reference formulas (SURVEY.md §4 test strategy)."""

import numpy as np
import pytest

from ursabench_tpu.ops import metrics as M


@pytest.fixture(scope="module")
def probs_targets():
    rng = np.random.default_rng(0)
    n, k = 500, 10
    logits = rng.normal(size=(n, k)) * 2
    probs = np.exp(logits - logits.max(1, keepdims=True))
    probs /= probs.sum(1, keepdims=True)
    targets = rng.integers(0, k, n)
    return probs.astype(np.float64), targets


def test_auroc_matches_sklearn():
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(1)
    for trial in range(5):
        labels = rng.integers(0, 2, 300)
        scores = rng.normal(size=300) + labels * 0.7
        if trial % 2:  # inject heavy ties
            scores = np.round(scores, 1)
        ours = float(M.auroc(labels, scores))
        ref = roc_auc_score(labels, scores)
        assert ours == pytest.approx(ref, abs=1e-6)


def test_average_precision_matches_sklearn():
    from sklearn.metrics import average_precision_score

    rng = np.random.default_rng(2)
    for trial in range(5):
        labels = rng.integers(0, 2, 300)
        scores = rng.normal(size=300) + labels * 0.7
        if trial % 2:
            scores = np.round(scores, 1)
        ours = float(M.average_precision(labels, scores))
        ref = average_precision_score(labels, scores)
        assert ours == pytest.approx(ref, abs=1e-6)


def _ref_ece(preds, targets, n_bins=15):
    """Reference ECE formula (prediction.py:152-182)."""
    bounds = np.linspace(0, 1, n_bins + 1)
    conf, pred = np.max(preds, 1), np.argmax(preds, 1)
    acc = pred == targets
    e = 0.0
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        in_bin = np.logical_and(conf > lo, conf <= hi)
        prop = np.mean(in_bin)
        if prop > 0:
            e += np.abs(np.mean(conf[in_bin]) - np.mean(acc[in_bin])) * prop
    return e


def test_ece_matches_reference_formula(probs_targets):
    probs, targets = probs_targets
    ours = float(M.ece(probs.astype(np.float32), targets))
    ref = _ref_ece(probs, targets)
    assert ours == pytest.approx(ref, abs=2e-5)


def test_brier_nll_error(probs_targets):
    probs, targets = probs_targets
    one_hot = np.zeros_like(probs)
    one_hot[np.arange(len(targets)), targets] = 1
    ref_brier = np.mean(np.sum((probs - one_hot) ** 2, 1))
    assert float(M.brier_score(probs.astype(np.float32), targets)) == pytest.approx(
        ref_brier, abs=1e-5
    )
    ref_nll = -np.mean(np.log(probs[np.arange(len(targets)), targets]))
    assert float(M.nll(probs.astype(np.float32), targets)) == pytest.approx(
        ref_nll, abs=1e-4
    )
    ref_err = 1 - np.mean(np.argmax(probs, 1) == targets)
    assert float(M.error_rate(probs.astype(np.float32), targets)) == pytest.approx(
        ref_err, abs=1e-6
    )


def test_misclass_auroc_matches_sklearn(probs_targets):
    from sklearn.metrics import average_precision_score, roc_auc_score

    probs, targets = probs_targets
    probs32 = probs.astype(np.float32)
    edu = np.random.default_rng(3).uniform(0, 1, len(targets)).astype(np.float32)
    miscls = (np.argmax(probs, 1) != targets).astype(int)
    for crit in ("entropy", "confidence", "model_uncertainty"):
        if crit == "entropy":
            vals = np.sum(-probs * np.log(probs), 1)
        elif crit == "confidence":
            vals = -probs.max(1)
        else:
            vals = np.sum(-probs * np.log(probs), 1) - edu
        assert float(M.misclass_auroc(probs32, targets, crit, edu)) == pytest.approx(
            roc_auc_score(miscls, vals), abs=1e-4
        )
        assert float(M.misclass_aucpr(probs32, targets, crit, edu)) == pytest.approx(
            average_precision_score(miscls, vals), abs=1e-4
        )


def test_sghmc_update_closed_form():
    """Single-leaf SGHMC step vs hand computation of optim_sghmc.py:43-67."""
    import jax
    import jax.numpy as jnp

    from ursabench_tpu.ops.sgmcmc import sghmc_update

    p = {"w": jnp.asarray([1.0, -2.0, 3.0])}
    v = {"w": jnp.asarray([0.1, 0.2, -0.3])}
    g = {"w": jnp.asarray([0.5, -0.5, 1.0])}
    lr, m, wd, n = 0.1, 0.9, 2.0, 100.0

    # noise off, not first step
    new_p, new_v = sghmc_update(
        p, v, g, lr=lr, momentum=m, wd_over_n=wd / n, n_train=n,
        noise_on=0.0, is_first_step=jnp.asarray(False), key=jax.random.PRNGKey(0),
    )
    d = np.asarray(g["w"]) + (wd / n) * np.asarray(p["w"])
    buf = m * np.asarray(v["w"]) - lr * d
    np.testing.assert_allclose(np.asarray(new_v["w"]), buf, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new_p["w"]), np.asarray(p["w"]) + buf, rtol=1e-6)

    # first step: buf_prev := d
    new_p2, new_v2 = sghmc_update(
        p, v, g, lr=lr, momentum=m, wd_over_n=wd / n, n_train=n,
        noise_on=0.0, is_first_step=jnp.asarray(True), key=jax.random.PRNGKey(0),
    )
    buf2 = m * d - lr * d
    np.testing.assert_allclose(np.asarray(new_v2["w"]), buf2, rtol=1e-6)

    # momentum = 0 (SGLD): p += -lr*d
    new_p3, new_v3 = sghmc_update(
        p, v, g, lr=lr, momentum=0.0, wd_over_n=wd / n, n_train=n,
        noise_on=0.0, is_first_step=jnp.asarray(False), key=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        np.asarray(new_p3["w"]), np.asarray(p["w"]) - lr * d, rtol=1e-6
    )

    # noise scale: with lr/m fixed, var of (noisy - clean) update ~ 2(1-m)lr/n^2
    keys = jax.random.split(jax.random.PRNGKey(42), 200)
    big_p = {"w": jnp.zeros(1000)}
    big_v = {"w": jnp.zeros(1000)}
    big_g = {"w": jnp.zeros(1000)}
    noisy = sghmc_update(
        big_p, big_v, big_g, lr=lr, momentum=m, wd_over_n=0.0, n_train=n,
        noise_on=1.0, is_first_step=jnp.asarray(False), key=keys[0],
    )[0]["w"]
    expected_std = np.sqrt(2 * (1 - m) * lr) / n
    assert np.std(np.asarray(noisy)) == pytest.approx(expected_std, rel=0.1)
