"""Sampler zoo: SGD, MCdropout, SWA, SWAG, PCASubspaceSampler, HMC."""

import jax
import numpy as np
import pytest

from ursabench_tpu import data, inference, models, tasks


@pytest.fixture(scope="module")
def tiny():
    # near-separable difficulty: these tests check sampler machinery
    # (convergence smoke, relative comparisons), not operating points —
    # with 128 train images the calibrated default difficulty is unlearnable
    splits, C = data.loaders(
        "MNIST", None, batch_size=32, use_validation=False,
        synthetic_n_train=128, synthetic_n_test=64,
        difficulty={"separation": 25.0, "label_noise": 0.0},
    )
    module = models.get_model("MLP200MNIST").build(C)
    return splits, C, module


def _eval_error(ens, splits, C):
    task = tasks.Prediction(
        {"in_distribution_test": splits["test"]}, C, metric_list=["error_rate"]
    )
    task.update_statistics(ens, output_performance=False)
    return task.get_performance_metrics()["error_rate"]


def test_sgd_map(tiny):
    splits, C, module = tiny
    s = inference.SGD(
        {"lr": 0.05, "epochs": 3, "momentum": 0.9, "weight_decay": 1e-4},
        model=module, train=splits["train"], key=jax.random.PRNGKey(0),
    )
    ens = s.sample()
    assert ens.num_members == 1
    assert _eval_error(ens, splits, C) < 0.5


def test_mcdropout(tiny):
    splits, C, module = tiny
    drop = models.get_model("MLP200MNIST_dropout").build(C)
    s = inference.MCdropout(
        {"lr": 0.05, "epochs": 2, "dropout": 0.2, "lengthscale": 0.01,
         "num_samples": 4, "momentum": 0.9, "weight_decay": 0},
        model=drop, train=splits["train"], key=jax.random.PRNGKey(1),
    )
    ens = s.sample()
    assert ens.num_members == 4
    assert ens.dropout_keys is not None
    # members share weights but produce different stochastic outputs
    x, _ = next(splits["test"].batches())
    logits = ens.logits_all(x)
    assert not np.allclose(np.asarray(logits[0]), np.asarray(logits[1]))


def test_swa_and_swag(tiny):
    splits, C, module = tiny
    hyp = {"swag_lr": 0.01, "swag_wd": 1e-4, "lr_init": 0.05, "num_samples": 3,
           "momentum": 0.9, "burn_in_epochs": 2, "num_iterates": 3}
    swa = inference.SWA(hyp, model=module, train=splits["train"],
                        key=jax.random.PRNGKey(2), max_rank=3, pca_rank=2)
    ens = swa.sample()
    assert ens.num_members == 3
    mean, var, cov = swa.get_space()
    assert mean.shape == var.shape == (swa.num_parameters,)
    assert cov.shape == (2, swa.num_parameters)
    assert float(var.min()) >= swa.VAR_CLAMP

    swag = inference.SWAG(
        {**hyp}, model=module, train=splits["train"], key=jax.random.PRNGKey(3),
        max_rank=3, pca_rank=2,
    )
    ens2 = swag.sample(num_samples=3, full_cov=True)
    assert ens2.num_members == 3
    p = jax.tree.leaves(ens2.params)[0]
    # true SWAG: drawn samples must differ
    assert not np.allclose(np.asarray(p[0]), np.asarray(p[1]))

    # reference-bug compat mode returns the collapsed mean every draw
    swag_ref = inference.SWAG(
        {**hyp}, model=module, train=splits["train"], key=jax.random.PRNGKey(4),
        max_rank=3, pca_rank=2, reference_bug_compat=True,
    )
    ens3 = swag_ref.sample(num_samples=2)
    p3 = jax.tree.leaves(ens3.params)[0]
    np.testing.assert_allclose(np.asarray(p3[0]), np.asarray(p3[1]))


def test_pca_subspace_sampler(tiny):
    splits, C, module = tiny
    hyp = {"swag_lr": 0.01, "swag_wd": 1e-4, "lr_init": 0.05, "num_samples": 3,
           "swag_momentum": 0.9, "swag_burn_in_epochs": 1, "num_swag_iterates": 4,
           "rank": 2, "max_rank": 4, "temperature": 100.0, "prior_std": 1.0}
    s = inference.PCASubspaceSampler(
        hyp, model=module, train=splits["train"], key=jax.random.PRNGKey(5)
    )
    ens = s.sample()
    assert ens.num_members == 3
    # theta state is (chains, subspace rank)
    assert s.current_theta.shape == (1, s.subspace.rank)


def test_pca_subspace_multichain(tiny):
    """PCASubspaceSampler(chains=C): one shared phase-1 subspace, C
    independent vmapped ESS streams -> C members per draw."""
    splits, C, module = tiny
    hyp = {"swag_lr": 0.01, "swag_wd": 1e-4, "lr_init": 0.05, "num_samples": 2,
           "swag_momentum": 0.9, "swag_burn_in_epochs": 1, "num_swag_iterates": 4,
           "rank": 2, "max_rank": 4, "temperature": 100.0, "prior_std": 1.0}
    s = inference.PCASubspaceSampler(
        hyp, model=module, train=splits["train"], key=jax.random.PRNGKey(6),
        chains=3,
    )
    ens = s.sample()
    assert ens.num_members == 6  # 2 draws x 3 chains
    assert s.current_theta.shape == (3, s.subspace.rank)
    # chains explore distinct subspace coordinates
    t = np.asarray(s.current_theta)
    assert not np.allclose(t[0], t[1])


def test_hmc(tiny):
    splits, C, module = tiny
    hyp = {"step_size": 5e-4, "num_samples": 6, "L": 3, "tau": 1.0,
           "burn": 2, "mass": 1.0}
    s = inference.HMC(hyp, model=module, train=splits["train"],
                      key=jax.random.PRNGKey(6))
    ens = s.sample()
    # chain incl. initial point: 7 draws, keep [2:] -> 5
    assert ens.num_members == 5
    assert 0.0 <= s.accept_rate <= 1.0

    # burn=-1 keeps exactly the last draw (time_script.py:83 protocol)
    s2 = inference.HMC({**hyp, "burn": -1}, model=module, train=splits["train"],
                       key=jax.random.PRNGKey(7))
    assert s2.sample().num_members == 1


def test_hmc_multichain(tiny):
    """HMC(chains=C) vmaps the transition over independent chains: a C-times
    ensemble, per-chain distinct states, acceptance preserved."""
    splits, C, module = tiny
    hyp = {"step_size": 5e-4, "num_samples": 5, "L": 2, "tau": 1.0,
           "burn": 1, "mass": 1.0, "draw_chunk": 3}
    s = inference.HMC(hyp, model=module, train=splits["train"],
                      key=jax.random.PRNGKey(9), chains=4)
    ens = s.sample()
    # chain incl. initial point: 6 draws/chain, keep [1:] -> 5 x 4 chains
    assert ens.num_members == 20
    assert 0.0 <= s.accept_rate <= 1.0
    p = jax.tree.leaves(ens.params)[0]
    # chains started from independent inits -> distinct members within a draw
    assert not np.allclose(np.asarray(p[0]), np.asarray(p[1]))

    # burn=-1 multi-chain keeps the last draw of each chain
    s2 = inference.HMC({**hyp, "burn": -1}, model=module,
                       train=splits["train"], key=jax.random.PRNGKey(10),
                       chains=2)
    assert s2.sample().num_members == 2


def test_subspace_pca_matches_sklearn():
    from sklearn.utils.extmath import randomized_svd

    from ursabench_tpu.inference.subspaces import PCASpace

    rng = np.random.default_rng(0)
    P, K = 500, 6
    space = PCASpace(P, pca_rank=4, max_rank=K)
    for _ in range(K):
        space.collect_vector(jax.numpy.asarray(rng.normal(size=P), dtype="float32"))
    ours = np.asarray(space.get_space())
    a = np.asarray(space.cov_mat_sqrt) / (max(1, space.rank - 1)) ** 0.5
    _, s_ref, vt_ref = randomized_svd(a, n_components=4, n_iter=5, random_state=0)
    ref = s_ref[:, None] * vt_ref
    # rows match up to sign
    for i in range(4):
        match = min(
            np.abs(ours[i] - ref[i]).max(), np.abs(ours[i] + ref[i]).max()
        )
        assert match < 1e-3


def test_bf16_compute_metric_parity(tiny):
    """bf16-compute SGHMC (dtype=jnp.bfloat16, params stay f32) must land at
    the same posterior quality as fp32 — the fp32/fp16 engine split of the
    reference's profiling protocol (trtprof/batch_onnx2trt.sh) applied to
    training."""
    import jax.numpy as jnp

    splits, C, _ = tiny
    # burn 10: compare CONVERGED posteriors (both dtypes reach 0% error on
    # the near-separable fixture) — at burn 3 the v6 canon-stat remap leaves
    # both mid-descent where 64-image error rates are trajectory noise
    hyp = {"lr": 0.05, "prior_std": 1.0, "num_samples": 4, "alpha": 0.1,
           "burn_in_epochs": 10}
    metrics = {}
    for tag, kw in (("fp32", {}), ("bf16", {"dtype": jnp.bfloat16})):
        module = models.get_model("MLP200MNIST").build(C, **kw)
        s = inference.SGHMC(hyp, model=module, train=splits["train"],
                            key=jax.random.PRNGKey(3))
        ens = s.sample()
        task = tasks.Prediction({"in_distribution_test": splits["test"]}, C,
                                metric_list=["error_rate", "nll", "ece"])
        task.update_statistics(ens, output_performance=False)
        metrics[tag] = task.get_performance_metrics()
    assert abs(metrics["fp32"]["error_rate"] - metrics["bf16"]["error_rate"]) < 0.05
    assert abs(metrics["fp32"]["nll"] - metrics["bf16"]["nll"]) < 0.05
    assert abs(metrics["fp32"]["ece"] - metrics["bf16"]["ece"]) < 0.05


def test_minka_mle_rank_selection():
    """pca_rank='mle' (reference subspaces.py:135-154): the evidence formula
    matches sklearn's Minka estimator, and the selected rank recovers the
    intrinsic dimension of a synthetic low-rank deviation matrix."""
    from sklearn.decomposition._pca import _assess_dimension

    from ursabench_tpu.inference.subspaces import PCASpace, minka_log_evidence

    # 1. formula parity: modern sklearn's _assess_dimension is the 0.20
    # _assess_dimension_ with pp = (m+rank)/2 instead of (m+rank+1)/2 — a
    # rank-constant offset of log(2*pi)/2 (argmax invariant)
    spectrum = np.array([5.0, 2.0, 0.8, 0.3, 0.1, 0.05])
    n_feat, n_samp = len(spectrum), 400
    for r in range(1, n_feat):
        ours = minka_log_evidence(spectrum, r, n_feat, n_samp)
        ref = float(_assess_dimension(spectrum, r, n_samp))
        assert abs((ours - np.log(2 * np.pi) / 2.0) - ref) < 1e-8, (r, ours, ref)

    # 2. end-to-end rank selection: K deviation vectors with 3 dominant
    # directions + tiny isotropic noise -> MLE picks rank 3
    rng = np.random.default_rng(3)
    P, K, true_rank = 400, 10, 3
    basis = rng.normal(size=(true_rank, P))
    space = PCASpace(P, pca_rank="mle", max_rank=K)
    for _ in range(K):
        coeff = rng.normal(size=true_rank) * np.array([30.0, 20.0, 10.0])
        v = coeff @ basis + 0.01 * rng.normal(size=P)
        space.collect_vector(jax.numpy.asarray(v, dtype="float32"))
    sv = np.asarray(space.get_space())
    assert space.pca_rank == true_rank
    assert sv.shape == (true_rank, P)
    # reference quirk mirrored: pca_rank is permanently overwritten to the int
    assert isinstance(space.pca_rank, int)


def test_deep_ensemble(tiny):
    splits, C, module = tiny
    de = inference.DeepEnsemble(
        {"lr": 0.05, "epochs": 2, "momentum": 0.9, "weight_decay": 1e-4,
         "num_members": 3},
        model=module, train=splits["train"], key=jax.random.PRNGKey(8),
    )
    ens = de.sample()
    assert ens.num_members == 3
    p = jax.tree.leaves(ens.params)[0]
    # members trained from independent inits -> distinct weights
    assert not np.allclose(np.asarray(p[0]), np.asarray(p[1]))
    assert not np.allclose(np.asarray(p[1]), np.asarray(p[2]))


def test_update_hyp_reuses_compiled_epoch(tiny):
    """update_hyp must not rebuild the jitted epoch program (hyperopt loops
    would otherwise recompile every iteration)."""
    splits, C, module = tiny
    s = inference.SGLD(
        {"lr": 0.03, "prior_std": 1.0, "num_samples": 1, "burn_in_epochs": 1},
        model=module, train=splits["train"], key=jax.random.PRNGKey(0),
    )
    fn_before = s._epoch_fn
    s.sample()
    s.update_hyp({"lr": 0.1, "prior_std": 0.5, "num_samples": 1,
                  "burn_in_epochs": 1})
    assert s._epoch_fn is fn_before
    s.sample()
    # the traced-hyp path must actually change behavior: different lr values
    # produce different parameters from identical keys
    s2 = inference.SGLD(
        {"lr": 0.03, "prior_std": 1.0, "num_samples": 1, "burn_in_epochs": 1},
        model=module, train=splits["train"], key=jax.random.PRNGKey(5),
    )
    p_a = np.asarray(jax.tree.leaves(s2.sample().params)[0])
    s2.update_hyp({"lr": 0.3, "prior_std": 1.0, "num_samples": 1,
                   "burn_in_epochs": 1})
    p_b = np.asarray(jax.tree.leaves(s2.sample().params)[0])
    assert not np.allclose(p_a, p_b)


def test_pca_subspace_chain_scan_matches_vmap(tiny):
    """ESS chains advanced by lax.scan (each bracket loop runs to its own
    trip count) draw the same coordinates as the vmapped lock-step chains —
    the transitions are deterministic given the per-chain keys."""
    splits, C, module = tiny
    hyp = {"swag_lr": 0.01, "swag_wd": 1e-4, "lr_init": 0.05, "num_samples": 2,
           "swag_momentum": 0.9, "swag_burn_in_epochs": 1, "num_swag_iterates": 4,
           "rank": 2, "max_rank": 4, "temperature": 100.0, "prior_std": 1.0}

    def run(strategy):
        s = inference.PCASubspaceSampler(
            hyp, model=module, train=splits["train"],
            key=jax.random.PRNGKey(6), chains=3, chain_strategy=strategy,
        )
        s.sample()
        assert s._resolved_chain_strategy == strategy
        return np.asarray(s.current_theta)

    np.testing.assert_allclose(run("scan"), run("vmap"), rtol=1e-5, atol=1e-6)


def test_hmc_chain_scan_matches_vmap(tiny):
    """HMC chains advanced by lax.scan draw identical trajectories to the
    vmapped chains (deterministic given per-chain keys)."""
    splits, C, module = tiny
    hyp = {"step_size": 5e-4, "num_samples": 4, "L": 3, "tau": 1.0,
           "burn": 0, "mass": 1.0, "draw_chunk": 4}

    def run(strategy):
        s = inference.HMC(hyp, model=module, train=splits["train"],
                          key=jax.random.PRNGKey(8), chains=2,
                          chain_strategy=strategy)
        ens = s.sample()
        assert s._resolved_chain_strategy == strategy
        return np.stack([np.concatenate([
            np.ravel(l) for l in jax.tree.leaves(ens.member(i)["params"])])
            for i in range(ens.num_members)])

    np.testing.assert_allclose(run("scan"), run("vmap"), rtol=1e-5, atol=1e-6)


def test_epoch_program_cached_across_sampler_instances(tiny):
    """Fresh samplers over the same (module, split shape, schedule) config
    must REUSE the compiled epoch program — hyperopt sweeps and the
    time_script protocol construct one sampler per evaluation (reference
    time_script.py:105-108), and without the engine-level program memo
    each construction paid a full recompile (measured ~21s/trial on the
    TPU service vs ~1.2s of actual training)."""
    from ursabench_tpu.inference import engine

    splits, C, _ = tiny
    hyp = {"lr": 0.05, "prior_std": 1.0, "num_samples": 1, "alpha": 0.1,
           "burn_in_epochs": 0}

    def fresh():
        module = models.get_model("MLP200MNIST").build(C)
        return inference.SGHMC(hyp, model=module, train=splits["train"],
                               key=jax.random.PRNGKey(0))

    a, b = fresh(), fresh()
    a.sample()
    n_after_a = a._epoch_fn._cache_size()
    b.sample()
    # b traced nothing new: same jitted program object, same trace cache
    assert b._epoch_fn._cache_size() == n_after_a
    # different batch size -> different program (no false sharing)
    resized, _ = data.loaders(
        "MNIST", None, batch_size=16, use_validation=False,
        synthetic_n_train=128, synthetic_n_test=64,
        difficulty={"separation": 25.0, "label_noise": 0.0},
    )
    module = models.get_model("MLP200MNIST").build(C)
    c = inference.SGHMC(hyp, model=module, train=resized["train"],
                        key=jax.random.PRNGKey(0))
    c.sample()
    assert c._epoch_fn._cache_size() >= 1
