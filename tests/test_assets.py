"""Sanity guards on committed benchmark artifacts.

Round-2 review found two classes of dead evidence that are cheap to guard
against: latency-table rows whose chip-side fields were never populated
(every mfu field None, all bs1 rows pinned to the ~28 ms RPC floor), and
baseline-suite metrics at degenerate operating points (error ~0, null
misclass AUROCs). These tests read the committed assets so a regeneration
that regresses either property fails CI.
"""

import json
import math
import os

import pytest

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")


def _load(name):
    path = os.path.join(ASSETS, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not committed")
    with open(path) as f:
        return json.load(f)


def test_latency_table_is_chip_true():
    table = _load("latency_table.json")
    assert table, "empty latency table"
    for key, row in table.items():
        assert row.get("amortized_latency_s"), f"{key}: no amortized timing"
        assert row.get("mfu_pct_of_bf16_peak") is not None, f"{key}: MFU dead"
        assert row.get("hbm_bytes_accessed"), f"{key}: HBM column dead"
    # the chip separates models at batch 1 (the RPC floor does not):
    wrn = table["WideResNet28x10.CIFAR10.bf16.ensemble6.bs1"]
    pre = table["PreResNet20.CIFAR10.bf16.ensemble6.bs1"]
    assert wrn["amortized_latency_s"] > 2 * pre["amortized_latency_s"]
    # the int8 engine premise holds in the batch-1 weight-streaming regime:
    i8 = table["WideResNet28x10.CIFAR10.int8.ensemble6.bs1"]
    assert i8["amortized_latency_s"] < 1.05 * wrn["amortized_latency_s"]
    # and int8 actually cuts HBM traffic vs fp32 weights:
    f32 = table["WideResNet28x10.CIFAR10.fp32.ensemble6.bs1"]
    assert i8["hbm_bytes_accessed"] < 0.5 * f32["hbm_bytes_accessed"]
    # the ImageNet-shape ResNet-50 engines (trtprof rn50_ensemble_2
    # analogue) are compute-bound even at batch 1 — MFU, not RPC floor:
    rn50 = table["INResNet50.ImageNet.bf16.ensemble2.bs1"]
    assert rn50["amortized_latency_s"] < 0.005
    assert rn50["mfu_pct_of_bf16_peak"] > 40


def test_baseline_suite_operating_points_are_realistic():
    suite = _load("baseline_suite.json")

    def finite(x):
        return x is not None and math.isfinite(x)

    checked = 0
    for name, cfg in suite.items():
        if not isinstance(cfg, dict):
            continue
        for mkey in ("metrics", "swa_metrics", "swag_metrics",
                     "deep_ensemble_metrics"):
            m = cfg.get(mkey)
            if not m:
                continue
            checked += 1
            err = m.get("error_rate")
            assert finite(err) and 0.005 < err < 0.6, (name, mkey, err)
            if "ece" in m:
                assert finite(m["ece"]) and m["ece"] > 1e-3, (name, mkey)
            for k, v in m.items():
                if "auroc" in k or "aucpr" in k:
                    assert finite(v) and 0.0 < v < 1.0, (name, mkey, k, v)
        if "ood_metrics" in cfg:
            from ursabench_tpu.data.sources import _SYNTH_GEN_VERSION

            if suite.get("synth_gen") != _SYNTH_GEN_VERSION:
                pytest.xfail(
                    "baseline_suite.json predates the shared-base OOD "
                    "calibration (synth v5) — regenerate on TPU: "
                    "benchmarks/baseline_suite.py"
                )
            for k, v in cfg["ood_metrics"].items():
                if "auroc" in k:
                    # DISCRIMINATIVE operating point: independent synthetic
                    # bases made OOD trivially separable (0.996 in r3); the
                    # shared-base 'base_shift' calibration must keep the
                    # task exercised below the ceiling and above chance
                    assert finite(v) and 0.55 < v < 0.98, (name, k, v)
    assert checked >= 4, "baseline suite lost its metric blocks"


def test_config4_operating_point_in_band():
    """The CIFAR-100/WRN-28x10 profile is CALIBRATED into the framework's
    design band (VERDICT r4 item 4): config4's BMA test error must sit in
    the 5-20% band (real CIFAR-100 is a ~20-30%-error problem; the r4
    profile trained to 2.4%, pinned at the 2% label-noise floor), with the
    CIFAR100<->SVHN OOD task still discriminative — AUROC inside the
    0.65-0.95 window, not saturated (the knife-edge mapped in
    assets/cifar100_difficulty_sweep.json: separation alone inverts AUROC
    below z~4.6, label noise above ~0.05 regularizes the off-manifold
    logits so hard that AUROC saturates >0.96; at the shipped profile the
    seed-6/7/8 spread is total-AUROC 0.74-0.83, model-AUROC 0.87-0.94, so
    the 0.95 ceiling is one seed-noise sigma above the measured spread
    while still rejecting the old 0.996-degenerate regime)."""
    suite = _load("baseline_suite.json")
    from ursabench_tpu.data.sources import _SYNTH_GEN_VERSION, \
        resolve_difficulty

    if suite.get("synth_gen") != _SYNTH_GEN_VERSION:
        pytest.xfail("baseline_suite.json predates the current synth "
                     "generator — regenerate on TPU")
    cfg = suite["config4_wrn_cifar100_sghmc_ood"]
    # the committed asset must have been generated at the shipped profile
    assert cfg["difficulty"] == resolve_difficulty("CIFAR100"), (
        "baseline_suite config4 predates the CIFAR100 difficulty profile — "
        "regenerate: benchmarks/baseline_suite.py --configs "
        "config4_wrn_cifar100_sghmc_ood")
    err = cfg["metrics"]["error_rate"]
    assert 0.05 <= err <= 0.20, f"config4 error {err} outside design band"
    for k, v in cfg["ood_metrics"].items():
        if "auroc" in k:
            assert 0.65 <= v <= 0.95, (k, v)


def test_stretch_bench_mfu_reported():
    stretch = _load("stretch_bench.json")
    assert stretch["tpu_sghmc_mfu_pct_bf16"] > 40
    assert stretch["speedup_steps"] > 50 and stretch["speedup_bma"] > 50
