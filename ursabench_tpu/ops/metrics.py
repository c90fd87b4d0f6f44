"""Uncertainty-evaluation metrics as pure JAX reductions.

Parity targets (formulas reproduced to ~1e-6, verified against sklearn in
tests/test_metrics.py):
- ECE, 15 bins, (lower, upper] semantics: /root/reference/URSABench/tasks/
  prediction.py:152-182.
- Brier: prediction.py:185-194.
- Misclassification criteria (entropy / confidence / model_uncertainty):
  prediction.py:222-267.
- AUROC == sklearn.roc_auc_score: rank statistic (Mann-Whitney U) with
  tie-averaged ranks — identical to the trapezoidal ROC integral.
- AUCPR == sklearn.average_precision_score: step-sum over unique decreasing
  thresholds, rewritten as a per-positive gather of group-end precision so it
  stays one fused sort+scan on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def error_rate(mean_probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    acc = jnp.mean((jnp.argmax(mean_probs, axis=1) == targets).astype(jnp.float32))
    return 1.0 - acc


def nll(mean_probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """F.nll_loss(log(probs), targets) — mean negative log prob of target."""
    logp = jnp.log(mean_probs)
    return -jnp.mean(jnp.take_along_axis(logp, targets[:, None], axis=1)[:, 0])


def brier_score(mean_probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    one_hot = jax.nn.one_hot(targets, mean_probs.shape[1], dtype=mean_probs.dtype)
    return jnp.mean(jnp.sum((mean_probs - one_hot) ** 2, axis=1))


def ece(mean_probs: jnp.ndarray, targets: jnp.ndarray, n_bins: int = 15) -> jnp.ndarray:
    """Expected calibration error, bin b = (b/n, (b+1)/n]."""
    confidences = jnp.max(mean_probs, axis=1)
    accuracies = (jnp.argmax(mean_probs, axis=1) == targets).astype(jnp.float32)
    # (lower, upper] binning: ceil(c*n)-1, clipped
    bins = jnp.clip(jnp.ceil(confidences * n_bins).astype(jnp.int32) - 1, 0, n_bins - 1)
    n = confidences.shape[0]
    counts = jax.ops.segment_sum(jnp.ones_like(confidences), bins, n_bins)
    acc_sum = jax.ops.segment_sum(accuracies, bins, n_bins)
    conf_sum = jax.ops.segment_sum(confidences, bins, n_bins)
    nonzero = counts > 0
    safe = jnp.maximum(counts, 1.0)
    delta = jnp.abs(conf_sum / safe - acc_sum / safe)
    return jnp.sum(jnp.where(nonzero, delta * counts / n, 0.0))


def _tie_averaged_ranks(scores: jnp.ndarray) -> jnp.ndarray:
    """1-based ranks with ties assigned their group-average rank."""
    s = jnp.sort(scores)
    lo = jnp.searchsorted(s, scores, side="left")
    hi = jnp.searchsorted(s, scores, side="right")
    return (lo + hi + 1).astype(jnp.float64 if scores.dtype == jnp.float64 else jnp.float32) / 2.0


def auroc(labels: jnp.ndarray, scores: jnp.ndarray) -> jnp.ndarray:
    """roc_auc_score(labels, scores); labels in {0,1}, higher score => 1.

    Degenerate label sets (npos==0 or nneg==0) return NaN — the jitted
    analogue of sklearn's ValueError (e.g. misclassification AUROC when the
    ensemble classifies everything correctly); callers surface the NaN
    rather than a misleading number."""
    labels = labels.astype(jnp.float32)
    ranks = _tie_averaged_ranks(scores)
    npos = jnp.sum(labels)
    nneg = labels.shape[0] - npos
    pos_rank_sum = jnp.sum(ranks * labels)
    return (pos_rank_sum - npos * (npos + 1) / 2.0) / (npos * nneg)


def average_precision(labels: jnp.ndarray, scores: jnp.ndarray) -> jnp.ndarray:
    """average_precision_score(labels, scores) with sklearn's step-sum
    semantics: AP = (1/npos) * sum over positives of the precision at their
    tie-group end (all samples scoring >= that sample's score). npos==0
    returns NaN (see auroc note)."""
    labels = labels.astype(jnp.float32)
    n = scores.shape[0]
    order = jnp.argsort(-scores)
    s_desc = scores[order]
    y_desc = labels[order]
    tp_cum = jnp.cumsum(y_desc)
    asc = s_desc[::-1]
    # number of samples with score >= v  (group end index + 1 in desc order)
    ge1 = n - jnp.searchsorted(asc, s_desc, side="left")
    prec_at_group_end = tp_cum[ge1 - 1] / ge1
    npos = jnp.sum(labels)
    return jnp.sum(y_desc * prec_at_group_end) / npos


# -- misclassification detection (prediction.py:197-267) -----------------------


def misclass_targets(mean_probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """1 where top-1 prediction is wrong."""
    return (jnp.argmax(mean_probs, axis=1) != targets).astype(jnp.float32)


def misclass_criterion(
    preds: jnp.ndarray,
    criterion: str,
    expected_data_uncertainty: jnp.ndarray | None = None,
) -> jnp.ndarray:
    if criterion == "entropy":
        return jnp.sum(-preds * jnp.log(preds), axis=1)
    if criterion == "confidence":
        return -jnp.max(preds, axis=1)
    if criterion == "model_uncertainty":
        total = jnp.sum(-preds * jnp.log(preds), axis=1)
        return total - expected_data_uncertainty
    raise NotImplementedError(criterion)


def misclass_auroc(preds, targets, criterion, expected_data_uncertainty=None):
    m = misclass_targets(preds, targets)
    v = misclass_criterion(preds, criterion, expected_data_uncertainty)
    return auroc(m, v)


def misclass_aucpr(preds, targets, criterion, expected_data_uncertainty=None):
    m = misclass_targets(preds, targets)
    v = misclass_criterion(preds, criterion, expected_data_uncertainty)
    return average_precision(m, v)
