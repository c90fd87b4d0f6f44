"""Main benchmark driver — parity with /root/reference/URSABench/experiment.py.

Same flag surface (:12-37) and output shapes: validation mode appends one
CSV row of metrics for hyperopt consumption (:88-108; the reference's
use-before-assignment of model_ensemble at :91 is fixed — we actually
sample); test mode runs num_trials seeds of Prediction + Decision + OOD
(MNIST<->{FashionMNIST,KMNIST}, CIFAR<->{STL10,SVHN}, :115-158), aggregates
mean/std (:206-213), optional imbalanced decision rerun (:215-244), and
writes CSV + an .npz results dict (:252-266).
"""

from __future__ import annotations

import argparse
import csv
import json

import jax
import numpy as np

from . import data, inference, models, tasks
from .util import json_open_from_file

OOD_PAIRINGS = {
    "MNIST": ["FashionMNIST", "KMNIST"],
    "CIFAR10": ["STL10", "SVHN"],
    "CIFAR100": ["STL10", "SVHN"],
}


def build_parser():
    p = argparse.ArgumentParser(description="URSABench-TPU benchmark runner")
    p.add_argument("--dataset", type=str, default="CIFAR10")
    p.add_argument("--data_path", type=str, default=None)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--num_trials", type=int, default=1)
    p.add_argument("--model", type=str, required=True)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--inference_method", type=str, default="HMC")
    p.add_argument("--hyperparams", type=str, default=None)
    p.add_argument("--hyperparams_path", type=str, default=None)
    p.add_argument("--task", type=str, default="Prediction")
    p.add_argument("--split_classes", type=int, default=None)
    p.add_argument("--validation", type=float, default=0.2)
    p.add_argument("--use_val", action="store_true")
    p.add_argument("--use_dm_imbalance", action="store_true")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--save_path", type=str, default=None)
    p.add_argument("--device_num", type=int, default=0)  # parity; XLA places
    p.add_argument("--pretrained_model_path", type=str, default=None)
    p.add_argument("--chains", type=int, default=1)
    p.add_argument("--chain_strategy", choices=["auto", "scan", "vmap"],
                   default="auto",
                   help="how chains>1 execute on one chip: vmap batches "
                        "chain-stacked weights (grouped convolutions for "
                        "conv models), scan advances chains sequentially in "
                        "one program; auto = scan iff the model has convs")
    p.add_argument("--dtype", type=str, default="fp32",
                   choices=("fp32", "bf16"),
                   help="model compute dtype (params/metrics stay f32; the "
                        "fp32/fp16 engine split of the reference's profiling "
                        "protocol applied to training)")
    p.add_argument("--mesh", type=str, default="auto",
                   choices=("auto", "chain", "none"),
                   help="device layout: 'auto' = ('chain','data') mesh over "
                        "all devices (chains sharded, remaining devices do "
                        "data parallelism), 'chain' = chain axis only, "
                        "'none' = single device")
    p.add_argument("--checkpoint_path", type=str, default=None,
                   help="auto-checkpoint the sampler chain here and resume "
                        "from it if present")
    p.add_argument("--checkpoint_every", type=int, default=10)
    p.add_argument("--synthetic_n_train", type=int, default=None)
    p.add_argument("--synthetic_n_test", type=int, default=None)
    p.add_argument("--stream", action="store_true",
                   help="train from the host-streaming pipeline "
                        "(HostStreamingSplit: C++ prefetch + double-buffered "
                        "device_put) instead of a device-resident dataset — "
                        "the beyond-HBM configuration; composes with a "
                        "('chain'=1,'data'=N) mesh")
    p.add_argument("--stream_chunk", type=int, default=1, metavar="M",
                   help="with --stream, stage M batches per transfer and "
                        "scan the M training steps in one device program "
                        "(stage-to-HBM streaming: per-step dispatch/transfer "
                        "overhead amortizes M-fold; the epoch tail beyond a "
                        "whole number of chunks is dropped)")
    return p


def _load_hyp(args):
    if args.hyperparams is not None:
        return json.loads(args.hyperparams)
    if args.hyperparams_path is not None:
        return json_open_from_file(args.hyperparams_path)
    return None


def _load_pretrained(sampler, pretrained):
    """Warm-start a TrainState-based sampler from checkpointed variables
    (the reference's --pretrained_model_path state-dict load,
    experiment.py:72-73)."""
    if pretrained is None:
        return
    if not hasattr(sampler, "_state"):
        raise NotImplementedError(
            f"--pretrained_model_path is not supported for "
            f"{type(sampler).__name__}"
        )
    st = sampler._state
    replaced = st._replace(params=pretrained["params"])
    if pretrained.get("batch_stats"):
        replaced = replaced._replace(batch_stats=pretrained["batch_stats"])
    sampler._state = replaced


def _build_mesh(args):
    """Resolve the --mesh flag to a device mesh (None on one device)."""
    from .parallel import auto_mesh, chain_mesh

    if getattr(args, "mesh", "auto") == "none":
        return None
    if args.mesh == "chain":
        if args.chains > 1 and len(jax.devices()) > 1:
            return chain_mesh(args.chains)
        return None
    return auto_mesh(args.chains, batch_size=args.batch_size)


def _make_sampler(args, hyp, module, train_split, seed):
    import inspect

    method = inference.get_inference(args.inference_method)
    kwargs = {}
    mesh = _build_mesh(args)
    sig = inspect.signature(method.__init__).parameters
    if mesh is not None and "mesh" in sig:
        kwargs["mesh"] = mesh
    if "chain_strategy" in sig:
        kwargs["chain_strategy"] = args.chain_strategy
    sampler = method(
        hyperparameters=hyp, model=module, train=train_split,
        key=jax.random.PRNGKey(seed), chains=args.chains, **kwargs,
    )
    if args.checkpoint_path:
        resumed = sampler.enable_auto_checkpoint(
            f"{args.checkpoint_path}.seed{seed}.npz", args.checkpoint_every
        )
        if resumed:
            print(f"resumed chain at epoch {sampler.epochs_run}")
    return sampler


def _load_ood(args, cfg):
    out = []
    for d_name in OOD_PAIRINGS.get(args.dataset, []):
        loaders_ood, _ = data.loaders(
            d_name,
            (args.data_path + d_name) if args.data_path else None,
            args.batch_size, args.num_workers,
            transform_train=cfg.transform_train,
            transform_test=cfg.transform_test,
            use_validation=False, val_size=args.validation,
            synthetic_n_train=args.synthetic_n_train,
            synthetic_n_test=args.synthetic_n_test,
        )
        out.append({"data": d_name, "test": loaders_ood["test"]})
    return out


def main(argv=None):
    args = build_parser().parse_args(argv)
    hyperparams = _load_hyp(args)
    cfg = models.get_model(args.model)
    loaders, num_classes = data.loaders(
        args.dataset, args.data_path, args.batch_size, args.num_workers,
        transform_train=cfg.transform_train, transform_test=cfg.transform_test,
        shuffle_train=True, use_validation=args.use_val,
        val_size=args.validation, split_classes=args.split_classes,
        seed=args.seed,
        synthetic_n_train=args.synthetic_n_train,
        synthetic_n_test=args.synthetic_n_test,
    )
    train_split, test_split = loaders["train"], loaders["test"]
    if args.stream:
        # only epoch-driven samplers consume the train split exclusively
        # through the (streaming-capable) epoch/step programs; HMC and the
        # subspace/SWA family need the whole split device-resident
        # (full-batch potentials, BN refresh over train)
        epoch_driven = {"SGHMC", "SGLD", "cSGHMC", "cSGLD", "SGD", "MCdropout"}
        if args.inference_method not in epoch_driven:
            raise SystemExit(
                f"--stream supports the epoch-driven samplers "
                f"{sorted(epoch_driven)}; {args.inference_method} requires "
                "the full train split resident in HBM "
                "(full-batch gradients / train-epoch BN refresh)"
            )
        from .data.native import HostStreamingSplit

        train_split = HostStreamingSplit(
            train_split.images, train_split.labels,
            batch_size=train_split.batch_size, spec=train_split.spec,
            seed=args.seed, chunk_batches=args.stream_chunk,
        )
    num_classes = int(num_classes)
    build_kw = {}
    if args.dtype == "bf16":
        import jax.numpy as jnp

        build_kw["dtype"] = jnp.bfloat16
    module = cfg.build(num_classes, **build_kw)
    if args.pretrained_model_path is not None:
        from .utils_checkpoint import load_variables

        pretrained = load_variables(args.pretrained_model_path)
    else:
        pretrained = None

    task_loader = {"in_distribution_test": test_split}
    metric_list = "ALL"

    # ---- validation mode: one CSV row for the sweep (experiment.py:88-108)
    if args.task == "Prediction" and args.use_val:
        sampler = _make_sampler(args, hyperparams, module, train_split, args.seed)
        _load_pretrained(sampler, pretrained)
        ensemble = sampler.sample()
        task = tasks.Prediction(task_loader, num_classes, metric_list=metric_list)
        task.update_statistics(ensemble, output_performance=False, smoothing=True)
        perf = task.get_performance_metrics()
        hyp_values = [hyperparams[k] for k in sorted(hyperparams)] if hyperparams else []
        perf_values = [perf[k] for k in sorted(perf)]
        with open((args.save_path or "") + "results.csv", "a+") as f:
            csv.writer(f, dialect="excel").writerow([
                args.dataset, args.model, args.seed, args.inference_method,
                args.task, args.batch_size, *hyp_values, *perf_values,
            ])
        print(perf)
        return perf

    # ---- test mode (experiment.py:110-266)
    ood_list = _load_ood(args, cfg)
    results, temp, cost_list = {}, {}, []
    S = args.num_trials
    for s in range(S):
        print("Prediction:", s)
        sampler = _make_sampler(args, hyperparams, module, train_split, s)
        _load_pretrained(sampler, pretrained)
        ensemble = sampler.sample()

        task = tasks.Prediction(task_loader, num_classes, metric_list=metric_list)
        task.update_statistics(ensemble, output_performance=False, smoothing=True)
        perf = task.get_performance_metrics()

        if not args.use_dm_imbalance and args.dataset in (
            "MNIST", "CIFAR10", "CIFAR100"
        ):
            print("Running DM task on balanced data:", s)
            dec = tasks.Decision(
                {"decision_data_test": test_split}, num_classes
            )
            dec.update_statistics(ensemble, output_performance=False)
            cost_list.append(dec.get_performance_metrics()["True_Cost"])

        print("OOD:", s)
        for ood in ood_list:
            ood_task = tasks.OODDetection(
                {
                    "in_distribution_test": test_split,
                    "out_distribution_test": ood["test"],
                },
                num_classes,
            )
            dic = ood_task.update_statistics(ensemble, output_performance=True)
            for k, v in dic.items():
                temp.setdefault(k + "_" + ood["data"], []).append(v)

        for k in task.required_metric_list:
            temp.setdefault(k, []).append(perf[k])

    for k, vals in temp.items():
        results[k + "_mean"] = float(np.mean(vals))
        results[k + "_std"] = float(np.std(vals, ddof=1)) if len(vals) > 1 else 0.0

    if args.use_dm_imbalance and args.dataset in ("MNIST", "CIFAR10", "CIFAR100"):
        cost_list = []
        for s in range(S):
            print("Decision Making SEED:", s)
            loaders_imb, nc = data.loaders(
                args.dataset, args.data_path, args.batch_size, args.num_workers,
                transform_train=cfg.transform_train,
                transform_test=cfg.transform_test, shuffle_train=True,
                use_validation=False, val_size=args.validation,
                split_classes=args.split_classes, imbalance=True, seed=s,
                synthetic_n_train=args.synthetic_n_train,
                synthetic_n_test=args.synthetic_n_test,
            )
            sampler = _make_sampler(args, hyperparams, module,
                                    loaders_imb["train"], s)
            _load_pretrained(sampler, pretrained)
            ensemble = sampler.sample()
            dec = tasks.Decision(
                {"decision_data_test": loaders_imb["test"]}, int(nc)
            )
            dec.update_statistics(ensemble, output_performance=False)
            cost_list.append(dec.get_performance_metrics()["True_Cost"])

    if cost_list:
        results["cost_mean"] = float(np.mean(cost_list))
        results["cost_std"] = float(np.std(cost_list, ddof=1)) if len(cost_list) > 1 else 0.0

    print(sorted(results.keys()))
    print(results)
    if args.save_path:
        hyp_values = [hyperparams[k] for k in sorted(hyperparams)] if hyperparams else []
        with open(args.save_path + "results.csv", "a+") as f:
            csv.writer(f, dialect="excel").writerow([
                args.dataset, args.model, args.seed, args.inference_method,
                args.task, args.batch_size, *hyp_values,
                *[results[k] for k in sorted(results)],
            ])
        np.savez(args.save_path + "_tests.npz", **results)
    return results


if __name__ == "__main__":
    main()
