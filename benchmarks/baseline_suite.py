"""BASELINE.md config suite: run all five baseline configurations
end-to-end on the current device and write one artifact
(assets/baseline_suite.json) with task metrics + wall times.

Configs (BASELINE.md "Baseline plan", scaled-down budgets recorded in the
artifact — the protocol shapes match, epoch counts are reduced so the whole
matrix completes in minutes):
  1. MLP200 / MNIST        — SGLD, 50 posterior samples, BMA acc+NLL+ECE
  2. LeNet-5 / FashionMNIST — SGHMC with 4 parallel chains + SWA baseline
  3. PreResNet-20 / CIFAR-10 — SWAG (rank-20) + DeepEnsemble-5, full metrics
  4. WRN-28x10 / CIFAR-100  — multi-chain SGHMC + OOD vs SVHN
  5. PreResNet-20           — vectorized batched-BO sweep over SGHMC lr/prior

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/baseline_suite.py \
           [--configs config4_wrn_cifar100_sghmc_ood ...]
(--configs reruns a subset, merging into the existing artifact.)
"""

import argparse
import json
import math
import os
import time

ASSET = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "assets", "baseline_suite.json")
)


def _clean(d):
    return {
        k: (None if isinstance(v, float) and not math.isfinite(v) else v)
        for k, v in d.items()
    }


def _predict(ens, splits, C, metric_list="ALL"):
    from ursabench_tpu import tasks

    t = tasks.Prediction({"in_distribution_test": splits["test"]}, C,
                         metric_list=metric_list)
    t.update_statistics(ens, output_performance=False)
    return _clean(t.get_performance_metrics())


def config1(data_path):
    import jax

    from ursabench_tpu import data, inference, models

    splits, C = data.loaders("MNIST", data_path, batch_size=128,
                             use_validation=False)
    module = models.get_model("MLP200MNIST").build(C)
    hyp = {"lr": 0.03, "prior_std": 1.0, "num_samples": 50,
           "burn_in_epochs": 3}
    s = inference.SGLD(hyp, model=module, train=splits["train"],
                       key=jax.random.PRNGKey(1))
    ens = s.sample()
    return {"hyp": hyp, "num_members": ens.num_members,
            "metrics": _predict(ens, splits, C,
                                metric_list=["error_rate", "nll", "ece"])}


def config2(data_path):
    import jax

    from ursabench_tpu import data, inference, models

    cfg = models.get_model("LeNet5MNIST")
    splits, C = data.loaders("FashionMNIST", data_path, batch_size=128,
                             use_validation=False,
                             transform_train=cfg.transform_train,
                             transform_test=cfg.transform_test)
    module = cfg.build(C)
    hyp = {"lr": 0.01, "prior_std": 1.0, "num_samples": 3, "alpha": 0.1,
           "burn_in_epochs": 8}
    s = inference.SGHMC(hyp, model=module, train=splits["train"],
                        key=jax.random.PRNGKey(2), chains=4)
    ens = s.sample()
    # lr_init 0.05 diverges LeNet-5 on the calibrated FashionMNIST
    # difficulty (nll -> log K); 0.02 trains cleanly
    swa_hyp = {"swag_lr": 0.005, "swag_wd": 1e-4, "lr_init": 0.02,
               "num_samples": 1, "momentum": 0.9, "burn_in_epochs": 8,
               "num_iterates": 10}
    swa = inference.SWA(swa_hyp, model=module, train=splits["train"],
                        key=jax.random.PRNGKey(3))
    swa_ens = swa.sample()
    return {
        "hyp": hyp, "chains": 4, "num_members": ens.num_members,
        "metrics": _predict(ens, splits, C,
                            metric_list=["error_rate", "nll", "ece"]),
        "swa_metrics": _predict(swa_ens, splits, C,
                                metric_list=["error_rate", "nll", "ece"]),
    }


def config3(data_path):
    import jax

    from ursabench_tpu import data, inference, models

    cfg = models.get_model("PreResNet20")
    splits, C = data.loaders("CIFAR10", data_path, batch_size=128,
                             use_validation=False,
                             transform_train=cfg.transform_train,
                             transform_test=cfg.transform_test)
    module = cfg.build(C)
    swag_hyp = {"swag_lr": 0.01, "swag_wd": 1e-4, "lr_init": 0.05,
                "num_samples": 10, "momentum": 0.9, "burn_in_epochs": 12,
                "num_iterates": 20}
    swag = inference.SWAG(swag_hyp, model=module, train=splits["train"],
                          key=jax.random.PRNGKey(4), max_rank=20)
    swag_ens = swag.sample()
    de = inference.DeepEnsemble(
        {"lr": 0.05, "epochs": 10, "momentum": 0.9, "weight_decay": 1e-4,
         "num_members": 5},
        model=module, train=splits["train"], key=jax.random.PRNGKey(5))
    de_ens = de.sample()
    return {
        "swag_hyp": swag_hyp, "swag_rank": 20,
        "swag_num_members": swag_ens.num_members,
        "swag_metrics": _predict(swag_ens, splits, C),
        "deep_ensemble_metrics": _predict(de_ens, splits, C),
    }


def config4(data_path):
    import jax

    from ursabench_tpu import data, inference, models, tasks

    cfg = models.get_model("WideResNet28x10")
    splits, C = data.loaders("CIFAR100", data_path, batch_size=128,
                             use_validation=False,
                             transform_train=cfg.transform_train,
                             transform_test=cfg.transform_test)
    ood_splits, _ = data.loaders("SVHN", data_path, batch_size=128,
                                 use_validation=False,
                                 transform_train=cfg.transform_train,
                                 transform_test=cfg.transform_test)
    module = cfg.build(C)
    hyp = {"lr": 0.05, "prior_std": 1.0, "num_samples": 2, "alpha": 0.1,
           "burn_in_epochs": 8}
    s = inference.SGHMC(hyp, model=module, train=splits["train"],
                        key=jax.random.PRNGKey(6), chains=2)
    ens = s.sample()
    ood = tasks.OODDetection(
        {"in_distribution_test": splits["test"],
         "out_distribution_test": ood_splits["test"]}, C)
    ood.update_statistics(ens, output_performance=False)
    from ursabench_tpu.data.sources import resolve_difficulty
    return {
        "hyp": hyp, "chains": 2, "num_members": ens.num_members,
        "difficulty": resolve_difficulty("CIFAR100"),
        "metrics": _predict(ens, splits, C,
                            metric_list=["error_rate", "nll", "ece"]),
        "ood_metrics": _clean(ood.get_performance_metrics()),
    }


def config5(data_path):
    from ursabench_tpu import data, models, tasks
    from ursabench_tpu.hyperopt import batched_bayesopt_sghmc

    cfg = models.get_model("PreResNet20")
    splits, C = data.loaders("CIFAR10", data_path, batch_size=128,
                             use_validation=False,
                             transform_train=cfg.transform_train,
                             transform_test=cfg.transform_test)
    module = cfg.build(C)

    def task_factory():
        return tasks.Prediction({"in_distribution_test": splits["test"]}, C,
                                metric_list=["ll"])

    domain = [
        {"name": "lr", "type": "continuous", "domain": (1e-3, 0.2),
         "option": "logspace"},
        {"name": "prior_std", "type": "continuous", "domain": (0.3, 3.0),
         "option": "logspace"},
        {"name": "alpha", "type": "constant", "domain": 0.1},
        {"name": "num_samples", "type": "constant", "domain": 1},
        {"name": "burn_in_epochs", "type": "constant", "domain": 4},
    ]
    best_hyp, best_obj, hyps, objs = batched_bayesopt_sghmc(
        domain, module, splits["train"], task_factory,
        rounds=2, q=4, init_evaluations=4, seed=7)
    return {
        "domain": ["lr (logspace 1e-3..0.2)", "prior_std (logspace 0.3..3)"],
        "evaluations": len(objs),
        "best_hyp": {k: float(v) for k, v in best_hyp.items()},
        "best_ll": best_obj,
        "all_ll": objs,
    }


def main():
    all_configs = [("config1_mlp_mnist_sgld", config1),
                   ("config2_lenet_fashion_sghmc4_swa", config2),
                   ("config3_preresnet_swag_deepensemble", config3),
                   ("config4_wrn_cifar100_sghmc_ood", config4),
                   ("config5_vectorized_bo_sweep", config5)]
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="*",
                    default=[n for n, _ in all_configs],
                    choices=[n for n, _ in all_configs])
    args = ap.parse_args()

    import jax

    from ursabench_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    from ursabench_tpu.data.sources import _SYNTH_GEN_VERSION

    data_path = os.environ.get("URSA_DATA", "./data")
    results = {}
    if set(args.configs) != {n for n, _ in all_configs} \
            and os.path.exists(ASSET):
        with open(ASSET) as f:
            results = json.load(f)  # subset rerun: merge into the artifact
    results.update({"device": str(jax.devices()[0]),
                    "synth_gen": _SYNTH_GEN_VERSION,
                    "note": "reduced budgets (protocol shapes per BASELINE.md), sized so the calibrated synthetic difficulty trains to realistic operating points"})
    for name, fn in [(n, f) for n, f in all_configs if n in args.configs]:
        t0 = time.perf_counter()
        results[name] = fn(data_path)
        results[name]["wall_seconds"] = round(time.perf_counter() - t0, 1)
        print(name, "done in", results[name]["wall_seconds"], "s", flush=True)
    with open(ASSET, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: v for k, v in results.items() if k != "note"})[:2000])


if __name__ == "__main__":
    main()
