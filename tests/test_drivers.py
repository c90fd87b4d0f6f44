"""CLI drivers, checkpointing, and profiling harness."""

import json
import os

import numpy as np
import pytest


def test_experiment_validation_mode(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from ursabench_tpu.experiment import main

    perf = main([
        "--dataset", "MNIST", "--model", "MLP200MNIST",
        "--inference_method", "SGLD", "--task", "Prediction", "--use_val",
        "--batch_size", "32", "--seed", "0",
        "--hyperparams",
        json.dumps({"lr": 0.03, "prior_std": 1.0, "num_samples": 2,
                    "burn_in_epochs": 1}),
        "--synthetic_n_train", "160", "--synthetic_n_test", "64",
    ])
    assert "error_rate" in perf
    assert (tmp_path / "results.csv").exists()


def test_experiment_test_mode(tmp_path):
    from ursabench_tpu.experiment import main

    results = main([
        "--dataset", "MNIST", "--model", "MLP200MNIST",
        "--inference_method", "SGLD", "--num_trials", "2",
        "--batch_size", "32", "--save_path", str(tmp_path / "out"),
        "--hyperparams",
        json.dumps({"lr": 0.03, "prior_std": 1.0, "num_samples": 2,
                    "burn_in_epochs": 1}),
        "--synthetic_n_train", "128", "--synthetic_n_test", "64",
    ])
    assert "error_rate_mean" in results and "error_rate_std" in results
    assert "total_uncertainty_auroc_FashionMNIST_mean" in results
    assert "cost_mean" in results
    assert (tmp_path / "outresults.csv").exists()
    assert (tmp_path / "out_tests.npz").exists()


def test_experiment_bf16_dtype(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from ursabench_tpu.experiment import main

    perf = main([
        "--dataset", "MNIST", "--model", "MLP200MNIST",
        "--inference_method", "SGLD", "--task", "Prediction", "--use_val",
        "--batch_size", "32", "--seed", "0", "--dtype", "bf16",
        "--hyperparams",
        json.dumps({"lr": 0.03, "prior_std": 1.0, "num_samples": 2,
                    "burn_in_epochs": 1}),
        "--synthetic_n_train", "160", "--synthetic_n_test", "64",
    ])
    assert "error_rate" in perf and np.isfinite(perf["error_rate"])


def test_experiment_chains_use_both_mesh_axes(tmp_path):
    """--chains N with --mesh auto must reach the production ('chain','data')
    sharded epoch program: chain states over 'chain', batch over 'data'."""
    import jax

    from ursabench_tpu.experiment import _build_mesh, _make_sampler, build_parser

    args = build_parser().parse_args([
        "--dataset", "MNIST", "--model", "MLP200MNIST",
        "--inference_method", "SGHMC", "--chains", "2", "--batch_size", "32",
    ])
    mesh = _build_mesh(args)
    assert mesh.shape == {"chain": 2, "data": 4}

    from ursabench_tpu import data, models

    splits, C = data.loaders("MNIST", None, batch_size=32,
                             use_validation=False, synthetic_n_train=64,
                             synthetic_n_test=32)
    module = models.get_model("MLP200MNIST").build(C)
    sampler = _make_sampler(
        args, {"lr": 0.03, "prior_std": 1.0, "num_samples": 1,
               "burn_in_epochs": 0, "alpha": 0.1},
        module, splits["train"], seed=0,
    )
    assert sampler.mesh is mesh
    ens = sampler.sample()
    assert ens.num_members == 2
    leaf = jax.tree.leaves(sampler._state.params)[0]
    assert len(leaf.sharding.device_set) == 8  # both axes in play


def test_time_script(tmp_path):
    from ursabench_tpu.time_script import main

    timer = main([
        "--dataset", "MNIST", "--model", "MLP200MNIST",
        "--save_path", str(tmp_path / "times"),
        "--methods", "SGLD", "SGD",
        "--S", "2", "--T", "2",
        "--synthetic_n_train", "96", "--synthetic_n_test", "32",
    ])
    assert "SGLD_mean" in timer and "SGD_std" in timer
    assert (tmp_path / "times.json").exists()


def test_tuned_hyperparams_asset():
    import ursabench_tpu

    path = os.path.join(os.path.dirname(ursabench_tpu.__file__), "..",
                        "assets", "tuned_hyperparams.json")
    with open(os.path.abspath(path)) as f:
        lib = json.load(f)
    assert "MLP200MNIST" in lib
    assert set(lib["MLP200MNIST"]) >= {
        "HMC", "SGLD", "SGHMC", "cSGLD", "cSGHMC", "SGD", "MCdropout",
        "PCASubspaceSampler",
    }
    # the WRN/CIFAR-10 SGHMC values quoted in SURVEY/BASELINE
    sghmc = lib["WideResNet28x10CIFAR10"]["SGHMC"]
    assert sghmc["lr"] == 0.1 and sghmc["burn_in_epochs"] == 100


def test_checkpoint_roundtrip(tmp_path):
    import jax

    from ursabench_tpu import data, inference, models
    from ursabench_tpu.utils_checkpoint import (
        load_ensemble, restore_sampler_state, save_ensemble,
        save_sampler_state,
    )

    splits, C = data.loaders("MNIST", None, batch_size=32, use_validation=False,
                             synthetic_n_train=96, synthetic_n_test=32)
    module = models.get_model("MLP200MNIST").build(C)
    hyp = {"lr": 0.03, "prior_std": 1.0, "num_samples": 2, "burn_in_epochs": 1}
    s = inference.SGLD(hyp, model=module, train=splits["train"],
                       key=jax.random.PRNGKey(0))
    ens = s.sample()
    save_ensemble(str(tmp_path / "ens.npz"), ens)
    ens2 = load_ensemble(str(tmp_path / "ens.npz"), module)
    assert ens2.num_members == ens.num_members
    a = np.asarray(jax.tree.leaves(ens.params)[0])
    b = np.asarray(jax.tree.leaves(ens2.params)[0])
    np.testing.assert_allclose(a, b)

    save_sampler_state(str(tmp_path / "state.npz"), s)
    s2 = inference.SGLD(hyp, model=module, train=splits["train"],
                        key=jax.random.PRNGKey(9))
    restore_sampler_state(str(tmp_path / "state.npz"), s2)
    assert s2.epochs_run == s.epochs_run and s2.burnt_in == s.burnt_in
    # resumed chain continues without error
    s2.sample_iterative()


def test_profiling_sweep(tmp_path):
    from ursabench_tpu.profiling import ProfileConfig, make_latex_table, run_sweep
    import ursabench_tpu.profiling.latency as lat

    # shrink protocol for CPU test speed
    orig = (lat.WARM_UP_ITERS, lat.REPS_PER_BATCH, lat.BURN_IN_BATCHES)
    lat.WARM_UP_ITERS, lat.REPS_PER_BATCH, lat.BURN_IN_BATCHES = 1, 2, 0
    try:
        cfgs = [ProfileConfig("MLP200MNIST", "MNIST", p, 2, 4)
                for p in ("fp32", "bf16")]
        cache_path = str(tmp_path / "cache.json")
        cache = run_sweep(cfgs, cache_path)
        assert len(cache) == 2
        for r in cache.values():
            assert r["latency_mean_s"] > 0
        # resume: second call hits the cache (no recompute)
        cache2 = run_sweep(cfgs, cache_path)
        assert cache2.keys() == cache.keys()
        tab = make_latex_table(cache)
        assert "bf16" in tab and "fp32" in tab and "tabular" in tab

        # device-amortized mode UPGRADES cached per-call entries in place
        cache3 = run_sweep(cfgs, cache_path, amortize_k=4)
        for r in cache3.values():
            assert r["latency_mean_s"] > 0  # per-call fields survived
            assert r["amortized_latency_s"] > 0
            assert r["amortized_loop_k"] == 4
        tab = make_latex_table(cache3)
        assert "device (ms)" in tab and "call (ms)" in tab

        # a larger requested K re-measures (cached K under-amortized the
        # tunnel RPC); same-or-smaller K keeps the cached row
        cache4 = run_sweep(cfgs, cache_path, amortize_k=8)
        for r in cache4.values():
            assert r["amortized_loop_k"] == 8
        cache5 = run_sweep(cfgs, cache_path, amortize_k=4)
        for r in cache5.values():
            assert r["amortized_loop_k"] == 8  # not downgraded

        # a per-call-only re-measure of an amortized row must NOT replace
        # the amortized-derived cost fields with RPC-floored per-call ones
        cache6_path = str(tmp_path / "cache6.json")
        run_sweep(cfgs, cache6_path, amortize_k=4, per_call=False)
        with open(cache6_path) as f:
            import json as _json
            before = _json.load(f)
        cache6 = run_sweep(cfgs, cache6_path, amortize_k=4, per_call=True)
        for k, r in cache6.items():
            assert r["latency_mean_s"] > 0  # per-call fields were added
            for fld in ("achieved_tflops", "hbm_gb_per_sec"):
                if fld in before[k]:
                    assert r[fld] == before[k][fld], fld
    finally:
        lat.WARM_UP_ITERS, lat.REPS_PER_BATCH, lat.BURN_IN_BATCHES = orig


def test_amortized_engine_matches_per_call_engine():
    """The K-forward fori_loop engine's accumulated output equals K x the
    single forward's (the chaining perturbation underflows to bit-exact x),
    and per-forward cost metadata is attached."""
    import jax

    from ursabench_tpu import models
    from ursabench_tpu.inference.engine import init_variables
    from ursabench_tpu.profiling.latency import (build_amortized_engine,
                                                 build_engine)
    from ursabench_tpu.util import tree_stack

    module = models.get_model("MLP200MNIST").build(10)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    params = tree_stack(
        [init_variables(module, k, (28, 28, 1))["params"] for k in keys]
    )
    engine, x = build_engine(module, params, None, 4, (28, 28, 1), "fp32")
    engine_k, xk = build_amortized_engine(module, params, None, 4,
                                          (28, 28, 1), "fp32", loop_k=7)
    probs = np.asarray(engine(x))
    acc = float(np.asarray(engine_k(xk)))
    np.testing.assert_allclose(acc, 7 * probs.sum(), rtol=1e-5)
    assert engine_k.loop_k == 7
    # int8 amortized engine also builds + runs
    q_k, xq = build_amortized_engine(module, params, None, 4, (28, 28, 1),
                                     "int8", loop_k=3)
    assert np.isfinite(float(np.asarray(q_k(xq))))


def test_prediction_latency_mode_and_profile():
    import jax

    from ursabench_tpu import data, models, tasks
    from ursabench_tpu.profiling import ProfileConfig
    from ursabench_tpu.profiling.latency import profile_prediction

    splits, C = data.loaders("MNIST", None, batch_size=32, use_validation=False,
                             synthetic_n_train=64, synthetic_n_test=96)
    cfg = ProfileConfig("MLP200MNIST", "MNIST", "fp32", 2, 32)
    out = profile_prediction(cfg, splits, C)
    assert out["latency_mean_s"] > 0
    assert "error_rate" in out["metrics"]


def test_experiment_imbalanced_decision(tmp_path):
    from ursabench_tpu.experiment import main

    results = main([
        "--dataset", "MNIST", "--model", "MLP200MNIST",
        "--inference_method", "SGLD", "--num_trials", "1",
        "--batch_size", "32", "--use_dm_imbalance",
        "--save_path", str(tmp_path / "imb"),
        "--hyperparams",
        json.dumps({"lr": 0.03, "prior_std": 1.0, "num_samples": 2,
                    "burn_in_epochs": 1}),
        "--synthetic_n_train", "512", "--synthetic_n_test", "64",
    ])
    assert "cost_mean" in results


def test_experiment_pretrained_model_path(tmp_path):
    import jax

    from ursabench_tpu import data, models
    from ursabench_tpu.experiment import main
    from ursabench_tpu.inference.engine import init_variables
    from ursabench_tpu.utils_checkpoint import save_variables

    module = models.get_model("MLP200MNIST").build(10)
    variables = init_variables(module, jax.random.PRNGKey(7), (28, 28, 1))
    ckpt = str(tmp_path / "pretrained.npz")
    save_variables(ckpt, variables)

    perf = main([
        "--dataset", "MNIST", "--model", "MLP200MNIST",
        "--inference_method", "SGLD", "--task", "Prediction", "--use_val",
        "--batch_size", "32", "--pretrained_model_path", ckpt,
        "--save_path", str(tmp_path / "val"),
        "--hyperparams",
        json.dumps({"lr": 0.01, "prior_std": 1.0, "num_samples": 1,
                    "burn_in_epochs": 0}),
        "--synthetic_n_train", "96", "--synthetic_n_test", "32",
    ])
    assert "error_rate" in perf
    assert (tmp_path / "valresults.csv").exists()  # not written to CWD


def test_engine_export_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from ursabench_tpu import models
    from ursabench_tpu.inference.engine import init_variables
    from ursabench_tpu.profiling.export import (
        export_bma_engine, load_engine, save_engine,
    )
    from ursabench_tpu.util import tree_stack

    module = models.get_model("MLP200MNIST").build(10)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    variables = [init_variables(module, k, (28, 28, 1)) for k in keys]
    params = tree_stack([v["params"] for v in variables])

    blob = export_bma_engine(module, params, None, 4, (28, 28, 1))
    path = str(tmp_path / "mlp.bma.stablehlo")
    save_engine(path, blob)
    engine = load_engine(path)
    x = jnp.ones((4, 28, 28, 1), jnp.float32)
    probs = engine(x)
    assert probs.shape == (4, 10)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)

    # must match the live forward
    def live(x):
        logits = jax.vmap(
            lambda p: module.apply({"params": p}, x, train=False)
        )(params)
        return np.asarray(
            jnp.exp(jax.nn.log_softmax(logits, -1)).mean(0)
        )

    np.testing.assert_allclose(np.asarray(probs), live(x), rtol=1e-5, atol=1e-6)


def test_auto_checkpoint_resume(tmp_path):
    import jax

    from ursabench_tpu import data, inference, models

    splits, C = data.loaders("MNIST", None, batch_size=32, use_validation=False,
                             synthetic_n_train=96, synthetic_n_test=32)
    module = models.get_model("MLP200MNIST").build(C)
    hyp = {"lr": 0.03, "prior_std": 1.0, "num_samples": 3, "burn_in_epochs": 1}
    ckpt = str(tmp_path / "chain.npz")

    s1 = inference.SGLD(hyp, model=module, train=splits["train"],
                        key=jax.random.PRNGKey(0))
    assert not s1.enable_auto_checkpoint(ckpt, every_epochs=1)
    s1.sample_iterative()  # 2 epochs (burn+1), checkpoints each
    epochs_done = s1.epochs_run

    # "crash" and resume in a fresh sampler
    s2 = inference.SGLD(hyp, model=module, train=splits["train"],
                        key=jax.random.PRNGKey(99))
    assert s2.enable_auto_checkpoint(ckpt, every_epochs=1)
    assert s2.epochs_run == epochs_done and s2.burnt_in
    import numpy as _np

    a = _np.asarray(jax.tree.leaves(s1._state.params)[0])
    b = _np.asarray(jax.tree.leaves(s2._state.params)[0])
    _np.testing.assert_allclose(a, b)
    s2.sample_iterative()  # continues the chain
    assert s2.epochs_run == epochs_done + 1


def test_hmc_mid_chain_checkpoint_resume(tmp_path):
    """Kill-and-resume for HMC (VERDICT r2 weak #7): a chain checkpointed
    every draw and killed mid-trajectory resumes into the SAME final
    ensemble as an uninterrupted run (deterministic given the saved key)."""
    import jax

    from ursabench_tpu import data, inference, models

    splits, C = data.loaders("MNIST", None, batch_size=32,
                             use_validation=False, synthetic_n_train=64,
                             synthetic_n_test=32)
    module = models.get_model("MLP200MNIST").build(C)
    hyp = {"step_size": 5e-3, "num_samples": 6, "L": 1, "tau": 1.0,
           "burn": 0, "mass": 1.0, "draw_chunk": 2, "grad_batch": 64}
    ckpt = str(tmp_path / "hmc.npz")

    full = inference.HMC(hyp, model=module, train=splits["train"],
                         key=jax.random.PRNGKey(4))
    ens_full = full.sample()

    # interrupted run: checkpoint every 2 draws, stop after 4 of 6
    part = inference.HMC(hyp, model=module, train=splits["train"],
                         key=jax.random.PRNGKey(4))
    part.enable_auto_checkpoint(ckpt, every_epochs=2, resume=False)
    part.sample(num_samples=4)  # leaves a draws_done=4 checkpoint

    res = inference.HMC(hyp, model=module, train=splits["train"],
                        key=jax.random.PRNGKey(4))
    assert res.enable_auto_checkpoint(ckpt, every_epochs=2, resume=True)
    ens_res = res.sample()  # 2 remaining draws
    assert ens_res.num_members == ens_full.num_members
    for a, b in zip(jax.tree.leaves(ens_res.params),
                    jax.tree.leaves(ens_full.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_pca_ess_mid_chain_checkpoint_resume(tmp_path):
    """Kill-and-resume for PCA-ESS: the checkpoint carries the subspace
    (the expensive SWA phase) + per-draw subspace coordinates; the resumed
    run skips phase 1 entirely and finishes the remaining draws into the
    same ensemble as an uninterrupted run."""
    import jax

    from ursabench_tpu import data, inference, models

    splits, C = data.loaders("MNIST", None, batch_size=32,
                             use_validation=False, synthetic_n_train=64,
                             synthetic_n_test=32)
    module = models.get_model("MLP200MNIST").build(C)
    hyp = {"swag_lr": 0.01, "swag_wd": 1e-4, "lr_init": 0.02,
           "num_samples": 4, "swag_momentum": 0.9, "swag_burn_in_epochs": 1,
           "num_swag_iterates": 3, "rank": 2, "max_rank": 3,
           "temperature": 100.0, "prior_std": 1.0}
    ckpt = str(tmp_path / "ess.npz")

    full = inference.PCASubspaceSampler(hyp, model=module,
                                        train=splits["train"],
                                        key=jax.random.PRNGKey(6))
    ens_full = full.sample()

    part = inference.PCASubspaceSampler(hyp, model=module,
                                        train=splits["train"],
                                        key=jax.random.PRNGKey(6))
    part.enable_auto_checkpoint(ckpt, every_epochs=1, resume=False)
    part.sample(num_samples=2)  # 2 of 4 draws checkpointed

    res = inference.PCASubspaceSampler(hyp, model=module,
                                       train=splits["train"],
                                       key=jax.random.PRNGKey(6))
    assert res.enable_auto_checkpoint(ckpt, every_epochs=1, resume=True)
    assert not res.subspace_constructed  # phase 1 NOT run yet
    ens_res = res.sample()
    assert res.subspace_constructed
    assert ens_res.num_members == ens_full.num_members
    for a, b in zip(jax.tree.leaves(ens_res.params),
                    jax.tree.leaves(ens_full.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

def test_resolve_spec_dataset_shapes():
    """ImageNet profiling rows use the trtprof rn50 engine setting (224x224,
    1000-way); CIFAR rows keep the model config's 32x32 eval transform."""
    from ursabench_tpu import models
    from ursabench_tpu.profiling import ProfileConfig
    from ursabench_tpu.profiling.latency import _resolve_spec

    mcfg = models.get_model("INResNet50")
    shape, classes = _resolve_spec(
        ProfileConfig("INResNet50", "ImageNet", "bf16", 2, 1), mcfg)
    assert shape == (224, 224, 3) and classes == 1000
    shape, classes = _resolve_spec(
        ProfileConfig("INResNet50", "CIFAR100", "bf16", 2, 1), mcfg)
    assert shape == (32, 32, 3) and classes == 100
    shape, classes = _resolve_spec(
        ProfileConfig("MLP200MNIST", "MNIST", "fp32", 1, 1),
        models.get_model("MLP200MNIST"))
    assert shape == (28, 28, 1) and classes == 10

def test_cli_dispatch(tmp_path, monkeypatch, capsys):
    """The unified CLI (cli.py) dispatches to the driver mains and returns
    shell-style exit codes for help/unknown commands."""
    import json as _json

    from ursabench_tpu.cli import main as cli_main

    monkeypatch.chdir(tmp_path)
    assert cli_main([]) == 0
    assert "Commands mirror" in capsys.readouterr().out
    assert cli_main(["frobnicate"]) == 2

    assert cli_main(["models"]) == 0
    listed = capsys.readouterr().out.split()
    assert "MLP200MNIST" in listed and "WideResNet28x10" in listed

    assert cli_main([
        "run", "--dataset", "MNIST", "--model", "MLP200MNIST",
        "--inference_method", "SGLD", "--task", "Prediction", "--use_val",
        "--batch_size", "32", "--seed", "0",
        "--hyperparams",
        _json.dumps({"lr": 0.03, "prior_std": 1.0, "num_samples": 1,
                     "burn_in_epochs": 0}),
        "--synthetic_n_train", "96", "--synthetic_n_test", "64",
    ]) == 0
    assert (tmp_path / "results.csv").exists()


def test_experiment_stream_flag(tmp_path):
    """--stream trains from the host-streaming pipeline; with the default
    --mesh auto on multi-device this engages the streamed+sharded step
    (HostStreamingSplit batches device_put pre-sharded over 'data')."""
    from ursabench_tpu.experiment import main

    perf = main([
        "--dataset", "MNIST", "--model", "MLP200MNIST",
        "--inference_method", "SGLD", "--task", "Prediction", "--use_val",
        "--batch_size", "32", "--seed", "0", "--stream",
        "--save_path", str(tmp_path / "st"),
        "--hyperparams",
        json.dumps({"lr": 0.03, "prior_std": 1.0, "num_samples": 1,
                    "burn_in_epochs": 0}),
        "--synthetic_n_train", "96", "--synthetic_n_test", "32",
    ])
    assert "error_rate" in perf and np.isfinite(perf["error_rate"])


def test_experiment_stream_rejects_non_epoch_samplers(tmp_path):
    """--stream with a sampler that needs the whole split device-resident
    (HMC full-batch potential, SWA/SWAG BN refresh, PCA subspace) exits
    with a clear message instead of an AttributeError mid-construction."""
    import pytest

    from ursabench_tpu.experiment import main

    for method in ("HMC", "SWAG", "PCASubspaceSampler"):
        with pytest.raises(SystemExit, match="epoch-driven"):
            main([
                "--dataset", "MNIST", "--model", "MLP200MNIST",
                "--inference_method", method, "--task", "Prediction",
                "--batch_size", "32", "--seed", "0", "--stream",
                "--save_path", str(tmp_path / "bad"),
                "--hyperparams", json.dumps({"lr": 0.03}),
                "--synthetic_n_train", "96", "--synthetic_n_test", "32",
            ])
