"""Calibrate the synthetic OOD operating point ('field_overlap').

The v5 shared-base change alone left config4 (WRN-28x10, CIFAR100<->SVHN)
at OOD AUROC 0.994: a saturated high-capacity model is diffuse on anything
off-manifold, so base-distance tweaks barely move detection. v6 adds
'field_overlap' (rho): same-shape datasets mix rho of a SHARED per-shape
class-field bank into their class fields, so OOD class-j images carry
genuine class-j evidence for an in-distribution model — near-OOD instead of
far-OOD. This driver measures AUROC as a function of rho on two proxies:

  mlp:  MLP200MNIST SGHMC on MNIST vs FashionMNIST/KMNIST (fast; the pair
        the r3 'base_shift' calibration used)
  wrn:  config4 itself — WRN-28x10 2-chain SGHMC on CIFAR100 vs SVHN
        (the pair that was degenerate)

The production default (sources._SYNTH_DIFFICULTY_DEFAULT['field_overlap'])
is chosen so the wrn pair lands in ~0.75-0.95 and the mlp pairs stay above
~0.6. Programs take data as jit ARGUMENTS, so sweeping rho recompiles
nothing — each point costs train time only.

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/ood_calibration.py \
           [--proxy mlp|wrn|both] [--rhos 0 0.45 0.6 0.75]
"""

import argparse
import json
import os
import time

ASSET = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "assets",
                 "ood_calibration.json")
)


def run_pair(model_name, dataset, ood_names, hyp, chains, rho=None, seed=6,
             difficulty=None, ood_difficulty="same"):
    """Train + eval one in-dist/OOD pairing under a difficulty override.
    ``rho`` is the field_overlap shorthand the rho-sweep uses; pass
    ``difficulty`` for arbitrary overrides (the separation sweep).
    ``ood_difficulty`` defaults to "same" (the override applies to both
    loaders — the historical sweep behavior); pass None to resolve the OOD
    dataset from its own production defaults (the candidate-validation
    mode: a production _SYNTH_DIFFICULTY override only touches the in-dist
    profile, so the honest measurement leaves the OOD side alone), or a
    dict for an explicit OOD-side override."""
    import jax

    from ursabench_tpu import data, inference, models, tasks

    data_path = os.environ.get("URSA_DATA", "./data")
    diff = dict(difficulty or {})
    if rho is not None:
        diff["field_overlap"] = rho
    cfg = models.get_model(model_name)
    splits, C = data.loaders(dataset, data_path, batch_size=128,
                             use_validation=False,
                             transform_train=cfg.transform_train,
                             transform_test=cfg.transform_test,
                             difficulty=diff)
    module = cfg.build(C)
    s = inference.SGHMC(hyp, model=module, train=splits["train"],
                        key=jax.random.PRNGKey(seed), chains=chains)
    ens = s.sample()
    pred = tasks.Prediction({"in_distribution_test": splits["test"]}, C,
                            metric_list=["error_rate", "ece"])
    pred.update_statistics(ens, output_performance=False)
    from ursabench_tpu.data.sources import resolve_difficulty
    row = {"rho": rho, "model": model_name, "dataset": dataset,
           **({"difficulty": difficulty} if difficulty else {}),
           # self-describing rows: the production profile changed once
           # (r5 CIFAR100 recalibration) and the early rows don't say
           # which profile they were measured under
           "resolved_difficulty": resolve_difficulty(dataset, diff or None),
           "in_dist": {k: float(v) for k, v in
                       pred.get_performance_metrics().items()}}
    ood_diff = diff if ood_difficulty == "same" else (
        dict(ood_difficulty) if ood_difficulty else None)
    row["ood_difficulty"] = ood_diff
    for ood_name in ood_names:
        ood_splits, _ = data.loaders(ood_name, data_path, batch_size=128,
                                     use_validation=False,
                                     transform_train=cfg.transform_train,
                                     transform_test=cfg.transform_test,
                                     difficulty=ood_diff)
        ood = tasks.OODDetection(
            {"in_distribution_test": splits["test"],
             "out_distribution_test": ood_splits["test"]}, C)
        ood.update_statistics(ens, output_performance=False)
        row[ood_name] = {k: float(v) for k, v in
                         ood.get_performance_metrics().items()}
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--proxy", choices=["mlp", "wrn", "both"], default="both")
    p.add_argument("--rhos", type=float, nargs="*",
                   default=[0.0, 0.45, 0.6, 0.75])
    args = p.parse_args()

    from ursabench_tpu.util import enable_compilation_cache
    enable_compilation_cache()

    out = {"rhos": args.rhos, "rows": []}
    if os.path.exists(ASSET):
        try:
            with open(ASSET) as f:
                out = json.load(f)
            # the top-level field must describe ALL rows, including this
            # run's — merge rather than keep the first run's list
            out["rhos"] = sorted(set(out.get("rhos", [])) | set(args.rhos))
        except Exception:
            pass
    for rho in args.rhos:
        if args.proxy in ("mlp", "both"):
            t0 = time.perf_counter()
            row = run_pair(
                "MLP200MNIST", "MNIST", ["FashionMNIST", "KMNIST"],
                {"lr": 0.03, "prior_std": 1.0, "num_samples": 10,
                 "alpha": 0.1, "burn_in_epochs": 3}, chains=1, rho=rho)
            row["wall_s"] = round(time.perf_counter() - t0, 1)
            out["rows"].append(row)
            print(json.dumps(row), flush=True)
        if args.proxy in ("wrn", "both"):
            t0 = time.perf_counter()
            row = run_pair(
                "WideResNet28x10", "CIFAR100", ["SVHN"],
                {"lr": 0.05, "prior_std": 1.0, "num_samples": 2,
                 "alpha": 0.1, "burn_in_epochs": 8}, chains=2, rho=rho)
            row["wall_s"] = round(time.perf_counter() - t0, 1)
            out["rows"].append(row)
            print(json.dumps(row), flush=True)
        with open(ASSET, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
