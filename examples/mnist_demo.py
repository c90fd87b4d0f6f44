"""URSABench-TPU MNIST demo — the runnable equivalent of the reference's
examples/URSABench_MNIST_demo.ipynb: train an MLP on a small MNIST subset
with cSGHMC and SGD, compare BMA accuracy / NLL / ECE.

Run:  python examples/mnist_demo.py [--data_path ./data]
With no data on disk a deterministic synthetic MNIST stand-in is used.
"""

import argparse
import time

import jax

from ursabench_tpu import data, inference, models, tasks


def evaluate(name, ensemble, test_split, num_classes):
    task = tasks.Prediction(
        {"in_distribution_test": test_split}, num_classes,
        metric_list=["error_rate", "nll", "ece"],
    )
    task.update_statistics(ensemble, output_performance=False)
    m = task.get_performance_metrics()
    print(f"{name:>8}: accuracy={1 - m['error_rate']:.4f} "
          f"nll={m['nll']:.4f} ece={m['ece']:.4f}")
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", type=str, default=None)
    ap.add_argument("--n_train", type=int, default=2048)
    args = ap.parse_args()

    splits, C = data.loaders(
        "MNIST", args.data_path, batch_size=128, use_validation=False,
        synthetic_n_train=args.n_train if args.data_path is None else None,
        synthetic_n_test=1024 if args.data_path is None else None,
    )
    module = models.get_model("MLP200MNIST").build(C)
    print(f"train={splits['train'].n} test={splits['test'].n} classes={C} "
          f"device={jax.devices()[0]}")

    t0 = time.time()
    sgd = inference.SGD(
        {"lr": 0.05, "epochs": 5, "momentum": 0.9, "weight_decay": 1e-4},
        model=module, train=splits["train"], key=jax.random.PRNGKey(0),
    )
    sgd_ens = sgd.sample()
    print(f"SGD trained in {time.time() - t0:.1f}s")
    evaluate("SGD", sgd_ens, splits["test"], C)

    t0 = time.time()
    csghmc = inference.cSGHMC(
        {"lr_0": 0.05, "prior_std": 1.0, "num_samples_per_cycle": 3,
         "cycle_length": 8, "burn_in_epochs": 2, "num_cycles": 2, "alpha": 0.1},
        model=module, train=splits["train"], key=jax.random.PRNGKey(1),
    )
    csghmc_ens = csghmc.sample()
    print(f"cSGHMC drew {csghmc_ens.num_members} samples in {time.time() - t0:.1f}s")
    evaluate("cSGHMC", csghmc_ens, splits["test"], C)


if __name__ == "__main__":
    main()
