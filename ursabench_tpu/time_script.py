"""Sampler wall-time benchmark — parity with
/root/reference/URSABench/time_script.py.

Protocol (:70-125): for each inference method, load its BO-tuned
hyperparameters, zero/normalize the burn-in so runs measure steady-state
sampling (:82-98), draw S=3 samples, T=10 trials, record mean +- std
seconds per method to JSON. The reference's 'PCA' list entry resolves to no
class (latent defect, SURVEY.md §5) and is dropped here; 'HMC' honors the
burn=-1 single-sample protocol.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from . import data, inference, models
from .util import json_open_from_file, make_dic_json_format

DEFAULT_METHODS = [
    "HMC", "SGLD", "SGHMC", "cSGLD", "cSGHMC", "SWAG", "MCdropout", "SGD",
    "PCASubspaceSampler",
]


def normalize_burnin(method: str, hyp: dict, S: int) -> dict:
    """time_script.py:82-98 burn-in zeroing rules."""
    hyp = dict(hyp)
    if method == "HMC":
        hyp["burn"] = -1
    if method == "SWAG":
        hyp["burn_in_epochs"] = 1
    if method in ("SGHMC", "SGLD"):
        hyp["burn_in_epochs"] = 0
    if method in ("cSGHMC", "cSGLD"):
        hyp["burn_in_epochs"] = 0
        hyp["num_cycles"] = 1
        hyp["num_samples_per_cycle"] = S
        # keep the cycle assertion satisfiable (csghmc.py:46)
        hyp["cycle_length"] = max(hyp.get("cycle_length", S + 2), S + 2)
    if method in ("MCdropout", "SGD"):
        hyp["epochs"] = 0
    if method == "PCASubspaceSampler":
        hyp["swag_burn_in_epochs"] = 1
        hyp["num_swag_iterates"] = max(
            2, min(int(hyp.get("num_swag_iterates", 5)), 5)
        )
    hyp["num_samples"] = S
    return hyp


def load_method_hyp(hyperparams_path: str | None, method: str,
                    model: str = "MLP200MNIST",
                    dataset: str = "MNIST") -> dict | None:
    """Per-method `<path><Method>_BO.json` (time_script.py:77) with fallback
    to the bundled tuned-hyperparameter library, matched to the benchmarked
    model+dataset (groups are named like 'WideResNet28x10CIFAR10')."""
    if hyperparams_path:
        p = hyperparams_path + method + "_BO.json"
        if os.path.exists(p):
            return json_open_from_file(p)
    bundled = os.path.join(
        os.path.dirname(__file__), "..", "assets", "tuned_hyperparams.json"
    )
    if os.path.exists(bundled):
        lib = json_open_from_file(os.path.abspath(bundled))
        for group in (f"{model}{dataset}", model, f"{model}{dataset.upper()}"):
            if group in lib and method in lib[group]:
                return lib[group][method]
    return None


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, default="MNIST")
    p.add_argument("--data_path", type=str, default=None)
    p.add_argument("--model", type=str, default="MLP200MNIST")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--hyperparams_path", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--methods", type=str, nargs="*", default=DEFAULT_METHODS)
    p.add_argument("--S", type=int, default=3)
    p.add_argument("--T", type=int, default=10)
    p.add_argument("--warmup_trials", type=int, default=0,
                   help="untimed trials per method first (excludes XLA "
                        "compilation from the timing; the reference protocol "
                        "has no warmup, default 0 for parity)")
    p.add_argument("--synthetic_n_train", type=int, default=None)
    p.add_argument("--synthetic_n_test", type=int, default=None)
    args = p.parse_args(argv)

    cfg = models.get_model(args.model)
    loaders, num_classes = data.loaders(
        args.dataset, args.data_path, args.batch_size,
        transform_train=cfg.transform_train, transform_test=cfg.transform_test,
        use_validation=False, seed=args.seed,
        synthetic_n_train=args.synthetic_n_train,
        synthetic_n_test=args.synthetic_n_test,
    )
    train_split = loaders["train"]
    num_classes = int(num_classes)

    timer = {}
    for method in args.methods:
        hyp = load_method_hyp(args.hyperparams_path, method,
                              model=args.model, dataset=args.dataset)
        cls_default = getattr(inference.get_inference(method), "_DEFAULT_HYP", None)
        if hyp is None and cls_default is not None:
            print(f"{method}: no tuned hyperparameters found, using defaults")
            hyp = dict(cls_default)
        if hyp is not None:
            hyp = normalize_burnin(method, hyp, args.S)
        print(method)
        print(f"Time for {args.S} sample.")
        cls = inference.get_inference(method)
        model_name = args.model
        times = np.zeros(args.T)
        for t in range(-args.warmup_trials, args.T):
            print("Trial:", t)
            if method == "MCdropout":
                module = models.dropout_twin(model_name).build(num_classes)
            else:
                module = cfg.build(num_classes)
            sampler = cls(hyperparameters=hyp, model=module, train=train_split,
                          key=jax.random.PRNGKey(args.seed + t))
            t0 = time.perf_counter()
            ens = sampler.sample()
            # host-fetch sync: block_until_ready can return early on remote
            # device tunnels, so fetch a scalar depending on the samples
            np.asarray(jax.numpy.sum(jax.tree.leaves(ens.params)[0]))
            if t >= 0:
                times[t] = time.perf_counter() - t0
        timer[method + "_mean"] = float(times.mean())
        timer[method + "_std"] = float(times.std(ddof=1)) if args.T > 1 else 0.0
        print("Time:", times.mean(), "+-", timer[method + "_std"])

    timer = make_dic_json_format(timer)
    with open(args.save_path + ".json", "w") as f:
        json.dump(timer, f)
    print(json.dumps(timer))
    return timer


if __name__ == "__main__":
    main()
