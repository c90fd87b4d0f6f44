"""Calibrate the synthetic CIFAR-100 difficulty for HIGH-CAPACITY models.

VERDICT r4 weak-4: data/sources.resolve_difficulty targets trained models
at 5-20% error, but config4 (WRN-28x10/CIFAR-100 SGHMC,
benchmarks/baseline_suite.py) landed at 2.4% — the z=5.5 profile was
calibrated on a nearest-empirical-mean proxy that a 36M-param model beats
by 8x, so the uncertainty headline ran in an unrealistically easy regime.
Real CIFAR-100 is a ~20-30%-error problem for WRN-28x10.

This sweep trains the config4 model (shortened: 1 chain, burn 5, 2 draws)
under candidate (separation, label_noise) profiles and reports test error.
High capacity solves the learnable class structure, so the operating point
must come mostly from IRREDUCIBLE noise: label_noise sets an aleatoric
floor of ~label_noise*(k-1)/k and lower separation adds genuine Bayes
overlap. The chosen profile goes into sources._SYNTH_DIFFICULTY and
baseline_suite/ood_calibration are regenerated against it.

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/cifar100_difficulty_sweep.py
"""

import json
import os
import time

CANDIDATES = [
    {"separation": 5.5, "label_noise": 0.02},   # current (the 2.4% profile)
    {"separation": 3.0, "label_noise": 0.10},
    {"separation": 2.5, "label_noise": 0.15},
    {"separation": 2.0, "label_noise": 0.18},
]

ASSET = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "assets",
                 "cifar100_difficulty_sweep.json")
)


def main():
    import jax

    from ursabench_tpu import data, inference, models, tasks
    from ursabench_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    cfg = models.get_model("WideResNet28x10")
    rows = []
    for cand in CANDIDATES:
        t0 = time.perf_counter()
        splits, C = data.loaders(
            "CIFAR100", None, batch_size=128, use_validation=False,
            transform_train=cfg.transform_train,
            transform_test=cfg.transform_test, difficulty=cand,
        )
        module = cfg.build(C)
        s = inference.SGHMC(
            {"lr": 0.05, "prior_std": 1.0, "num_samples": 2, "alpha": 0.1,
             "burn_in_epochs": 5},
            model=module, train=splits["train"], key=jax.random.PRNGKey(6),
        )
        ens = s.sample()
        task = tasks.Prediction({"in_distribution_test": splits["test"]}, C,
                                metric_list=["error_rate", "nll", "ece"])
        task.update_statistics(ens, output_performance=False)
        m = {k: float(v) for k, v in task.get_performance_metrics().items()}
        row = {**cand, **m, "wall_s": round(time.perf_counter() - t0, 1)}
        rows.append(row)
        print(row, flush=True)
    with open(ASSET, "w") as f:
        json.dump({"model": "WRN-28x10 SGHMC burn5 x2 draws",
                   "rows": rows}, f, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
