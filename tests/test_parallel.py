"""Mesh parallelism on the 8-virtual-device CPU platform."""

import jax
import numpy as np

from ursabench_tpu import data, inference, models
from ursabench_tpu.parallel import chain_mesh, make_mesh


def test_chain_mesh_shapes():
    mesh = chain_mesh(chains=4)
    assert mesh.shape["chain"] == 4
    mesh2 = chain_mesh(chains=3)  # 3 chains on 8 devices -> 3-device mesh
    assert mesh2.shape["chain"] == 3


def test_mesh_sharded_sghmc_chains():
    splits, C = data.loaders(
        "MNIST", None, batch_size=32, use_validation=False,
        synthetic_n_train=128, synthetic_n_test=64,
    )
    module = models.get_model("MLP200MNIST").build(C)
    mesh = chain_mesh(chains=4)
    s = inference.SGHMC(
        {"lr": 0.03, "prior_std": 1.0, "num_samples": 2, "alpha": 0.1,
         "burn_in_epochs": 1},
        model=module, train=splits["train"], key=jax.random.PRNGKey(0),
        chains=4, mesh=mesh,
    )
    # chain state is actually sharded over devices
    leaf = jax.tree.leaves(s._state.params)[0]
    assert len(leaf.sharding.device_set) == 4
    ens = s.sample()
    assert ens.num_members == 8  # 2 draws x 4 chains
    p = jax.tree.leaves(ens.params)[0]
    # all chains differ
    for i in range(1, 4):
        assert not np.allclose(np.asarray(p[0]), np.asarray(p[i]))


def test_make_mesh_two_axes():
    mesh = make_mesh(8)
    assert mesh.shape["chain"] * mesh.shape["data"] == 8


def test_sharded_epoch_matches_single_device():
    """The production ('chain','data') SGHMC epoch program (mesh= on the
    sampler) must reproduce the single-device multi-chain epoch exactly:
    same per-chain key streams, psum-mean grads == global-mean grads,
    identical noise. MNIST/MLP has no augmentation/dropout, so the only
    seed divergence is float reduction order — which the noise-on momentum
    trajectory then AMPLIFIES over the 8 steps (observed ~7e-4 rel worst
    element on synth v5); the tolerance stays far below the O(1) divergence
    of the grad-through-psum bug class this test pins."""
    splits, C = data.loaders(
        "MNIST", None, batch_size=32, use_validation=False,
        synthetic_n_train=128, synthetic_n_test=64,
    )
    module = models.get_model("MLP200MNIST").build(C)
    hyp = {"lr": 0.03, "prior_std": 1.0, "num_samples": 2, "alpha": 0.1,
           "burn_in_epochs": 0}
    mesh = make_mesh(8)  # ('chain': 2, 'data': 4)
    assert mesh.shape["data"] > 1

    def run(mesh_arg):
        s = inference.SGHMC(hyp, model=module, train=splits["train"],
                            key=jax.random.PRNGKey(5), chains=2, mesh=mesh_arg)
        for _ in range(2):
            s._run_epoch(noise_on=True)
        return s

    sharded = run(mesh)
    single = run(None)
    # sharded state spans all 8 devices
    leaf = jax.tree.leaves(sharded._state.params)[0]
    assert len(leaf.sharding.device_set) == 8
    for a, b in zip(jax.tree.leaves(sharded._state.params),
                    jax.tree.leaves(single._state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-5)


def test_sharded_epoch_update_hyp_no_recompile():
    """The _hyp_scalars invariant extends to the multi-chip path: update_hyp
    on a mesh-sharded sampler reuses the compiled shard_map program."""
    splits, C = data.loaders(
        "MNIST", None, batch_size=32, use_validation=False,
        synthetic_n_train=64, synthetic_n_test=32,
    )
    module = models.get_model("MLP200MNIST").build(C)
    mesh = make_mesh(8)
    s = inference.SGHMC(
        {"lr": 0.03, "prior_std": 1.0, "num_samples": 1, "burn_in_epochs": 0,
         "alpha": 0.1},
        model=module, train=splits["train"], key=jax.random.PRNGKey(0),
        chains=2, mesh=mesh,
    )
    fn_before = s._epoch_fn
    s.sample()
    n_compiles = fn_before._cache_size()
    s.update_hyp({"lr": 0.1, "prior_std": 0.5, "num_samples": 1,
                  "burn_in_epochs": 0, "alpha": 0.2})
    assert s._epoch_fn is fn_before
    s.sample()
    assert fn_before._cache_size() == n_compiles


def test_data_parallel_single_chain():
    """chains=1 with a (1, n) mesh: pure data parallelism over the batch."""
    from jax.sharding import Mesh

    splits, C = data.loaders(
        "MNIST", None, batch_size=32, use_validation=False,
        synthetic_n_train=128, synthetic_n_test=64,
    )
    module = models.get_model("MLP200MNIST").build(C)
    mesh = Mesh(np.asarray(jax.devices()).reshape(1, 8), ("chain", "data"))

    def run(mesh_arg):
        s = inference.SGHMC(
            {"lr": 0.03, "prior_std": 1.0, "num_samples": 1,
             "burn_in_epochs": 1, "alpha": 0.1},
            model=module, train=splits["train"], key=jax.random.PRNGKey(2),
            chains=1, mesh=mesh_arg,
        )
        s._run_epoch(noise_on=True)
        return s

    sharded, single = run(mesh), run(None)
    for a, b in zip(jax.tree.leaves(sharded._state.params),
                    jax.tree.leaves(single._state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_swa_data_parallel_mesh():
    """SWA's single trajectory shards its minibatch over a (1, n) 'data'
    mesh; the resulting moments match the single-device run (psum'd
    global-mean grads) to fp tolerance."""
    from jax.sharding import Mesh

    splits, C = data.loaders(
        "MNIST", None, batch_size=32, use_validation=False,
        synthetic_n_train=128, synthetic_n_test=64,
    )
    module = models.get_model("MLP200MNIST").build(C)
    mesh = Mesh(np.asarray(jax.devices()).reshape(1, 8), ("chain", "data"))
    hyp = {"swag_lr": 0.01, "swag_wd": 0.001, "lr_init": 0.02,
           "num_samples": 1, "momentum": 0.9, "burn_in_epochs": 2,
           "num_iterates": 2}

    def run(mesh_arg):
        s = inference.SWA(hyp, model=module, train=splits["train"],
                          key=jax.random.PRNGKey(3), mesh=mesh_arg)
        s.sample_iterative()
        return s

    sharded, single = run(mesh), run(None)
    np.testing.assert_allclose(np.asarray(sharded.weight_mean),
                               np.asarray(single.weight_mean),
                               rtol=2e-4, atol=1e-5)
    # chain>1 meshes are rejected (single trajectory)
    bad = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("chain", "data"))
    try:
        inference.SWA(hyp, model=module, train=splits["train"],
                      key=jax.random.PRNGKey(3), mesh=bad)
        assert False, "expected ValueError for chain>1 mesh"
    except ValueError:
        pass


def test_deep_ensemble_mesh_sharded():
    """DeepEnsemble members train as mesh-sharded chains: 4 members over a
    ('chain': 2, 'data': 4) mesh in one shard_map epoch program."""
    splits, C = data.loaders(
        "MNIST", None, batch_size=32, use_validation=False,
        synthetic_n_train=128, synthetic_n_test=64,
    )
    module = models.get_model("MLP200MNIST").build(C)
    mesh = make_mesh(8)
    de = inference.DeepEnsemble(
        {"lr": 0.05, "epochs": 2, "momentum": 0.9, "weight_decay": 1e-4,
         "num_members": 4},
        model=module, train=splits["train"], key=jax.random.PRNGKey(11),
        mesh=mesh,
    )
    ens = de.sample()
    assert ens.num_members == 4
    p = jax.tree.leaves(ens.params)[0]
    assert not np.allclose(np.asarray(p[0]), np.asarray(p[1]))
    leaf = jax.tree.leaves(de._state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_task_eval_on_mesh_sharded_ensemble():
    """The PRODUCTION task path (Prediction -> accumulate_split) consumes an
    ensemble harvested from mesh-sharded sampling as-is: the params keep
    their 'chain' shardings and GSPMD partitions the member-vmapped eval —
    metrics must equal a fully-replicated evaluation of the same members."""
    from ursabench_tpu import tasks

    splits, C = data.loaders(
        "MNIST", None, batch_size=32, use_validation=False,
        synthetic_n_train=128, synthetic_n_test=64,
    )
    module = models.get_model("MLP200MNIST").build(C)
    mesh = make_mesh(8)
    s = inference.SGHMC(
        {"lr": 0.03, "prior_std": 1.0, "num_samples": 2, "burn_in_epochs": 0,
         "alpha": 0.1},
        model=module, train=splits["train"], key=jax.random.PRNGKey(5),
        chains=2, mesh=mesh,
    )
    ens = s.sample()
    assert ens.num_members == 4
    leaf = jax.tree.leaves(ens.params)[0]
    assert len(leaf.sharding.device_set) > 1  # still mesh-sharded

    def run_task(e):
        t = tasks.Prediction({"in_distribution_test": splits["test"]}, C,
                             metric_list=["error_rate", "nll", "ece"])
        t.update_statistics(e, output_performance=False)
        return t.get_performance_metrics()

    m_sharded = run_task(ens)
    from ursabench_tpu.inference.ensemble import Ensemble

    import jax.numpy as jnp

    replicated = Ensemble(
        module,
        jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), ens.params),
        jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), ens.batch_stats)
        if ens.batch_stats is not None else None,
        ens.num_members,
    )
    m_rep = run_task(replicated)
    for k in m_sharded:
        np.testing.assert_allclose(m_sharded[k], m_rep[k], rtol=1e-5,
                                   atol=1e-7)


def test_hmc_data_parallel_potential():
    """HMC with a ('chain','data') mesh computes the full-batch potential
    shard-wise (psum'd CE): log-posterior values match the single-device
    potential to fp tolerance, and sampling produces a valid multi-chain
    ensemble with the same statistics machinery."""
    splits, C = data.loaders(
        "MNIST", None, batch_size=32, use_validation=False,
        synthetic_n_train=96, synthetic_n_test=32,
    )
    module = models.get_model("MLP200MNIST").build(C)
    mesh = make_mesh(8)  # ('chain': 2, 'data': 4)
    hyp = {"step_size": 1e-3, "num_samples": 4, "L": 2, "tau": 1.0,
           "burn": 0, "mass": 1.0, "draw_chunk": 2, "grad_batch": 48}

    sharded = inference.HMC(hyp, model=module, train=splits["train"],
                            key=jax.random.PRNGKey(7), chains=2, mesh=mesh)
    single = inference.HMC(hyp, model=module, train=splits["train"],
                           key=jax.random.PRNGKey(7), chains=2)
    # identical ctor keys -> identical per-chain inits -> potential parity
    nlp_s, _ = sharded._build_fns()
    nlp_1, _ = single._build_fns()
    u_s = np.asarray(nlp_s(sharded._theta0))
    u_1 = np.asarray(nlp_1(single._theta0))
    np.testing.assert_allclose(u_s, u_1, rtol=1e-5)

    ens = sharded.sample()
    assert ens.num_members == (1 + 4) * 2  # (init + draws) x chains
    assert 0.0 <= sharded.accept_rate <= 1.0
    assert np.all(np.isfinite(np.asarray(jax.tree.leaves(ens.params)[0])))


def test_hmc_data_parallel_draws_match_single_device():
    """DRAW-level parity for data-parallel HMC at a step size with
    non-trivial acceptance: the sharded gradient (psum of per-shard
    grad(local_ll) + prior) must drive the *same trajectory* as the
    single-device full-batch gradient. A grad that differentiates through
    the psum yields data_shards x the local-shard gradient per device,
    diverging by ~0.1 per draw at this step size — far outside tolerance."""
    splits, C = data.loaders(
        "MNIST", None, batch_size=32, use_validation=False,
        synthetic_n_train=96, synthetic_n_test=32,
    )
    module = models.get_model("MLP200MNIST").build(C)
    mesh = make_mesh(8)  # ('chain': 2, 'data': 4)
    hyp = {"step_size": 2e-2, "num_samples": 6, "L": 3, "tau": 1.0,
           "burn": 0, "mass": 1.0, "draw_chunk": 3, "grad_batch": 48}

    def run(mesh_arg):
        s = inference.HMC(hyp, model=module, train=splits["train"],
                          key=jax.random.PRNGKey(7), chains=2, mesh=mesh_arg)
        return s, s.sample()

    sharded, ens_s = run(mesh)
    single, ens_1 = run(None)
    # the regime must exercise both MH branches for parity to mean anything
    assert 0.0 < single.accept_rate < 1.0, single.accept_rate
    assert sharded.accept_rate == single.accept_rate
    for a, b in zip(jax.tree.leaves(ens_s.params),
                    jax.tree.leaves(ens_1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_auto_mesh_layouts():
    from ursabench_tpu.parallel import auto_mesh

    m = auto_mesh(4)
    assert m.shape == {"chain": 4, "data": 2}
    m = auto_mesh(2, batch_size=128)
    assert m.shape == {"chain": 2, "data": 4}
    m = auto_mesh(1)
    assert m.shape == {"chain": 1, "data": 8}
    # batch not divisible by the leftover axis -> data axis shrinks
    m = auto_mesh(2, batch_size=33)
    assert m.shape == {"chain": 2, "data": 3}
    assert auto_mesh(3, n_devices=1) is None
    # nothing shardable at all (chains=1, batch coprime with every device
    # divisor) -> None, not a degenerate 1x1 mesh
    assert auto_mesh(1, batch_size=31) is None


def test_sharded_step_matches_single_device():
    """The ('chain','data') shard_map step must produce the same update as
    an unsharded reference computation (psum-mean grads == global mean)."""
    import jax.numpy as jnp
    import optax

    from ursabench_tpu.data.transforms import CIFAR_TEST, normalize
    from ursabench_tpu.inference.engine import init_variables
    from ursabench_tpu.ops.sgmcmc import sghmc_update
    from ursabench_tpu.parallel import make_mesh
    from ursabench_tpu.parallel.mesh import sharded_sghmc_step
    from ursabench_tpu.util import tree_stack

    mesh = make_mesh(8)
    chains = mesh.shape["chain"]
    batch = 8 * mesh.shape["data"]
    module = models.get_model("MLP200MNIST").build(10)
    spec = CIFAR_TEST.__class__(28, 1, (0.1307,), (0.3081,))

    keys = jax.random.split(jax.random.PRNGKey(0), chains)
    variables = [init_variables(module, k, (28, 28, 1)) for k in keys]
    params = tree_stack([v["params"] for v in variables])
    momentum = jax.tree.map(jnp.zeros_like, params)
    bstats = tree_stack([v.get("batch_stats", {}) for v in variables])
    chain_keys = jax.random.split(jax.random.PRNGKey(1), chains)

    lr, mom_c, wd, n_train = 0.05, 0.9, 1.0, 256
    step, state_sharding, batch_sharding = sharded_sghmc_step(
        module, mesh, spec, chains=chains, n_train=n_train,
        lr=lr, momentum=mom_c, wd=wd,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 255, (batch, 28, 28, 1)), jnp.uint8)
    y = jnp.asarray(rng.integers(0, 10, (batch,)), jnp.int32)

    place = lambda t: jax.tree.map(lambda a: jax.device_put(a, state_sharding), t)
    state = (place(params), place(momentum), place(bstats), place(chain_keys))
    new_params, new_mom, _, _ = step(
        state, jax.device_put(x, batch_sharding),
        jax.device_put(y, batch_sharding), jnp.asarray(0.0),  # noise off
    )

    # unsharded reference: global-mean gradient per chain + same update
    xf = normalize(x, spec)

    def ref_chain(p, b, k):
        def loss(pp):
            v = {"params": pp}
            logits = module.apply(v, xf, train=True, mutable=["batch_stats"],
                                  rngs={"dropout": jax.random.PRNGKey(0)})[0]
            return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

        grads = jax.grad(loss)(p)
        _, k_noise = jax.random.split(k)
        return sghmc_update(
            p, jax.tree.map(jnp.zeros_like, p), grads, lr=lr, momentum=mom_c,
            wd_over_n=wd / n_train, n_train=float(n_train),
            noise_on=jnp.asarray(0.0), is_first_step=jnp.asarray(False),
            key=k_noise,
        )[0]

    for c in range(chains):
        expect = ref_chain(
            jax.tree.map(lambda a: a[c], params),
            jax.tree.map(lambda a: a[c], bstats),
            chain_keys[c],
        )
        got = jax.tree.map(lambda a: a[c], new_params)
        for e, g in zip(jax.tree.leaves(expect), jax.tree.leaves(got)):
            np.testing.assert_allclose(np.asarray(e), np.asarray(g),
                                       rtol=2e-4, atol=1e-5)


def test_pca_ess_data_parallel_matches_single_device():
    """Sharded ESS (full-data log-density shard-wise over 'data' with one
    psum per bracket evaluation, chains over 'chain') must reproduce the
    single-device ESS draws exactly: same subspace (the SWA phase key
    stream is identical), same per-chain keys, same bracket decisions."""
    splits, C = data.loaders(
        "MNIST", None, batch_size=32, use_validation=False,
        synthetic_n_train=96, synthetic_n_test=32,
    )
    module = models.get_model("MLP200MNIST").build(C)
    mesh = make_mesh(8)  # ('chain': 2, 'data': 4)
    hyp = {"swag_lr": 0.01, "swag_wd": 1e-4, "lr_init": 0.02,
           "num_samples": 2, "swag_momentum": 0.9, "swag_burn_in_epochs": 1,
           "num_swag_iterates": 3, "rank": 2, "max_rank": 3,
           "temperature": 100.0, "prior_std": 1.0}

    def run(mesh_arg):
        s = inference.PCASubspaceSampler(
            hyp, model=module, train=splits["train"],
            key=jax.random.PRNGKey(11), chains=2, mesh=mesh_arg,
        )
        for _ in range(2):
            s.sample_iterative(update_bn=False)
        return s

    sharded, single = run(mesh), run(None)
    np.testing.assert_allclose(np.asarray(sharded.current_theta),
                               np.asarray(single.current_theta),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded.current_lnpdf),
                               np.asarray(single.current_lnpdf),
                               rtol=2e-4, atol=1e-5)


def _fresh_state(module, key, shape):
    import jax.numpy as jnp

    from ursabench_tpu.inference.engine import TrainState, init_variables

    variables = init_variables(module, key, shape)
    return TrainState(
        params=variables["params"],
        momentum=jax.tree.map(jnp.zeros_like, variables["params"]),
        batch_stats=variables.get("batch_stats", {}),
        key=jax.random.PRNGKey(7),
        step=jnp.zeros((), jnp.int32),
    )


def test_streamed_sharded_step_matches_single_device():
    """The data-parallel streaming step (psum of local grads over 'data')
    reproduces the single-device streaming step exactly: same stream order
    (shuffle=False), same noise-key stream, global-mean gradient."""
    import jax.numpy as jnp

    from ursabench_tpu.data.native import HostStreamingSplit
    from ursabench_tpu.data.transforms import ImageSpec
    from ursabench_tpu.inference.engine import make_epoch_fn
    from ursabench_tpu.inference.sgmcmc import _cosine_hyp_lr, _sghmc_hyp_update

    rng = np.random.default_rng(0)
    n, bsz = 128, 32
    images = rng.integers(0, 256, (n, 28, 28, 1), dtype=np.uint8)
    labels = rng.integers(0, 10, n).astype(np.int64)
    spec = ImageSpec(28, 1, (0.5,), (0.5,))
    module = models.get_model("MLP200MNIST").build(10)
    mesh = make_mesh(8, chain_devices=1)  # ('chain': 1, 'data': 8)
    hyp = {
        "lr0": jnp.float32(0.05), "eta_min": jnp.float32(0.0),
        "t_max": jnp.float32(10.0), "momentum": jnp.float32(0.9),
        "wd_over_n": jnp.float32(1.0 / n), "n_train": jnp.float32(n),
    }

    def run(mesh_arg):
        stream = HostStreamingSplit(images, labels, batch_size=bsz, spec=spec,
                                    shuffle=False, seed=3)
        fn = make_epoch_fn(module, stream, lr_fn=_cosine_hyp_lr,
                           update_fn=_sghmc_hyp_update, mesh=mesh_arg)
        state = _fresh_state(module, jax.random.PRNGKey(0), spec.shape)
        for epoch in range(2):  # noise ON: the key stream must line up too
            state, loss = fn(state, jnp.float32(epoch), jnp.float32(1.0), hyp)
        return state, loss

    st_sharded, loss_sharded = run(mesh)
    st_single, loss_single = run(None)
    np.testing.assert_allclose(np.asarray(loss_sharded),
                               np.asarray(loss_single), rtol=2e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(st_sharded.params),
                    jax.tree.leaves(st_single.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_streamed_sharded_epoch_matches_in_hbm_sharded():
    """Full-batch (n == batch_size): the streamed+sharded epoch computes the
    same update as the in-HBM sharded epoch — one whole-data batch makes the
    global-mean gradient permutation-invariant, so the two paths' different
    shuffle machinery can't hide a semantics drift."""
    import jax.numpy as jnp

    from ursabench_tpu.data.arrays import DataSplit
    from ursabench_tpu.data.native import HostStreamingSplit
    from ursabench_tpu.data.transforms import ImageSpec
    from ursabench_tpu.inference.engine import make_epoch_fn
    from ursabench_tpu.inference.sgmcmc import _cosine_hyp_lr, _sghmc_hyp_update

    rng = np.random.default_rng(1)
    n = 64
    images = rng.integers(0, 256, (n, 28, 28, 1), dtype=np.uint8)
    labels = rng.integers(0, 10, n).astype(np.int64)
    spec = ImageSpec(28, 1, (0.5,), (0.5,))
    module = models.get_model("MLP200MNIST").build(10)
    mesh = make_mesh(8, chain_devices=1)
    hyp = {
        "lr0": jnp.float32(0.05), "eta_min": jnp.float32(0.0),
        "t_max": jnp.float32(10.0), "momentum": jnp.float32(0.9),
        "wd_over_n": jnp.float32(1.0 / n), "n_train": jnp.float32(n),
    }

    def run(split):
        fn = make_epoch_fn(module, split, lr_fn=_cosine_hyp_lr,
                           update_fn=_sghmc_hyp_update, use_augment=False,
                           mesh=mesh)
        state = _fresh_state(module, jax.random.PRNGKey(2), spec.shape)
        for epoch in range(2):  # noise off: key streams differ across paths
            state, _ = fn(state, jnp.float32(epoch), jnp.float32(0.0), hyp)
        return state

    streamed = run(HostStreamingSplit(images, labels, batch_size=n, spec=spec))
    in_hbm = run(DataSplit(images, labels, batch_size=n, spec=spec))
    for a, b in zip(jax.tree.leaves(streamed.params),
                    jax.tree.leaves(in_hbm.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_streamed_sharded_bn_step_matches_local_bn_oracle():
    """BatchNorm models on the streamed+sharded step use sync-free LOCAL BN:
    each shard normalizes by its own batch statistics (gradients are
    partition-dependent), the psum'd gradient is the mean of per-shard
    local-BN gradients, and the carried stats are the pmean of per-shard
    stats — the same semantics as the in-HBM sharded epoch. With
    shuffle=False the partition is the 8 contiguous slices, so the whole
    step is hand-computable: per-shard grad(local CE sum) averaged, one
    sghmc update, per-shard stats averaged."""
    import flax.linen as nn
    import jax.numpy as jnp
    import optax

    from ursabench_tpu.data.native import HostStreamingSplit
    from ursabench_tpu.data.transforms import ImageSpec, normalize
    from ursabench_tpu.inference.engine import init_variables, make_epoch_fn
    from ursabench_tpu.inference.sgmcmc import _cosine_hyp_lr, _sghmc_hyp_update

    class TinyBN(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(4, (3, 3))(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            x = nn.relu(x).mean(axis=(1, 2))
            return nn.Dense(10)(x)

    rng = np.random.default_rng(2)
    n, shards = 64, 8
    images = rng.integers(0, 256, (n, 8, 8, 1), dtype=np.uint8)
    labels = rng.integers(0, 10, n).astype(np.int64)
    spec = ImageSpec(8, 1, (0.5,), (0.5,))
    module = TinyBN()
    mesh = make_mesh(8, chain_devices=1)
    hyp = {
        "lr0": jnp.float32(0.05), "eta_min": jnp.float32(0.0),
        "t_max": jnp.float32(10.0), "momentum": jnp.float32(0.9),
        "wd_over_n": jnp.float32(1.0 / n), "n_train": jnp.float32(n),
    }

    split = HostStreamingSplit(images, labels, batch_size=n, spec=spec,
                               shuffle=False)
    fn = make_epoch_fn(module, split, lr_fn=_cosine_hyp_lr,
                       update_fn=_sghmc_hyp_update, use_augment=False,
                       mesh=mesh)
    state0 = _fresh_state(module, jax.random.PRNGKey(3), spec.shape)
    sharded, _ = fn(state0, jnp.float32(0.0), jnp.float32(0.0), hyp)

    # hand-built oracle over the known contiguous shard partition
    variables = init_variables(module, jax.random.PRNGKey(3), spec.shape)
    params0, bstats0 = variables["params"], variables["batch_stats"]
    x_full = normalize(jnp.asarray(images), spec)
    y_full = jnp.asarray(labels)

    def local_loss(p, x, y):
        logits, mut = module.apply(
            {"params": p, "batch_stats": bstats0}, x, train=True,
            mutable=["batch_stats"],
        )
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        return ce.sum(), mut["batch_stats"]

    grads, stats = [], []
    for i in range(shards):
        (_, st), g = jax.value_and_grad(local_loss, has_aux=True)(
            params0, x_full[i * 8:(i + 1) * 8], y_full[i * 8:(i + 1) * 8])
        grads.append(g)
        stats.append(st)
    g_mean = jax.tree.map(lambda *xs: jnp.stack(xs).sum(0) / n, *grads)
    stats_mean = jax.tree.map(lambda *xs: jnp.stack(xs).mean(0), *stats)
    lr = _cosine_hyp_lr(hyp, jnp.float32(0.0), jnp.float32(0.0),
                        jnp.int32(0))
    params_oracle, _ = _sghmc_hyp_update(
        params0, jax.tree.map(jnp.zeros_like, params0), g_mean, hyp,
        lr=lr, noise_on=jnp.float32(0.0), is_first_step=True,
        key=jax.random.PRNGKey(0),
    )

    for a, b in zip(jax.tree.leaves(sharded.params),
                    jax.tree.leaves(params_oracle)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(sharded.batch_stats),
                    jax.tree.leaves(stats_mean)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)
    assert jax.tree.leaves(sharded.batch_stats)  # BN stats actually exist


def test_sharded_chain_scan_matches_vmap():
    """On the ('chain','data') mesh with chains_per_device > 1, scanning the
    local chain block equals vmapping it (the grouped-convolution avoidance
    mirrors the single-chip chain_strategy), and conv models resolve 'auto'
    to scan."""
    import flax.linen as nn
    import jax.numpy as jnp

    class TinyConv(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(4, (3, 3))(x)
            x = nn.relu(x).mean(axis=(1, 2))
            return nn.Dense(10)(x)

    splits, C = data.loaders(
        "MNIST", None, batch_size=32, use_validation=False,
        synthetic_n_train=64, synthetic_n_test=32,
    )
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("chain", "data"))
    hyp = {"lr": 0.03, "prior_std": 1.0, "num_samples": 1, "alpha": 0.1,
           "burn_in_epochs": 0}

    def run(strategy):
        s = inference.SGHMC(hyp, model=TinyConv(), train=splits["train"],
                            key=jax.random.PRNGKey(6), chains=4, mesh=mesh,
                            chain_strategy=strategy)
        s._run_epoch(noise_on=True)
        return s

    st_s = run("scan")
    assert st_s._epoch_fn._chain_strategy == "scan"  # auto would pick scan too
    st_auto = run("auto")
    assert st_auto._epoch_fn._chain_strategy == "scan"
    st_v = run("vmap")
    for a, b in zip(jax.tree.leaves(st_s._state.params),
                    jax.tree.leaves(st_v._state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_chain_only_mesh_auto_resolves_to_vmap():
    """With the chain axis device-sharded (chain-only mesh, no 'data' axis),
    'auto' must resolve to vmap even for conv models: a global lax.scan over
    a sharded leading axis would serialize the chains ACROSS chips, while
    GSPMD partitions the vmapped program chain-parallel
    (engine.resolve_chain_strategy)."""
    import flax.linen as nn

    class TinyConv(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(4, (3, 3))(x)
            x = nn.relu(x).mean(axis=(1, 2))
            return nn.Dense(10)(x)

    from ursabench_tpu.inference.engine import resolve_chain_strategy

    splits, C = data.loaders(
        "MNIST", None, batch_size=32, use_validation=False,
        synthetic_n_train=64, synthetic_n_test=32,
    )
    spec_shape = splits["train"].spec.shape
    mesh = chain_mesh(chains=2)

    # the shared rule itself
    assert resolve_chain_strategy("auto", TinyConv(), spec_shape) == "scan"
    assert resolve_chain_strategy("auto", TinyConv(), spec_shape, mesh) == "vmap"
    # explicit choices are never overridden
    assert resolve_chain_strategy("scan", TinyConv(), spec_shape, mesh) == "scan"

    # end-to-end: a conv SGHMC on the chain mesh builds the vmapped epoch,
    # keeps its state sharded, and draws distinct chains
    s = inference.SGHMC(
        {"lr": 0.03, "prior_std": 1.0, "num_samples": 1, "alpha": 0.1,
         "burn_in_epochs": 0},
        model=TinyConv(), train=splits["train"], key=jax.random.PRNGKey(2),
        chains=2, mesh=mesh,
    )
    assert s._epoch_fn._chain_strategy == "vmap"
    leaf = jax.tree.leaves(s._state.params)[0]
    assert len(leaf.sharding.device_set) == 2
    ens = s.sample()
    p = jax.tree.leaves(ens.params)[0]
    assert not np.allclose(np.asarray(p[0]), np.asarray(p[1]))

    # HMC resolves mesh-aware too
    h = inference.HMC(
        {"step_size": 1e-4, "num_samples": 1, "L": 2, "tau": 1.0,
         "burn": 0, "mass": 1.0},
        model=TinyConv(), train=splits["train"], key=jax.random.PRNGKey(3),
        chains=2, mesh=mesh,
    )
    h._build_fns()
    assert h._resolved_chain_strategy == "vmap"


def test_streamed_sharded_chunk_matches_single_device():
    """The chunked (stage-to-HBM) sharded streaming scan reproduces the
    single-device PER-BATCH streaming path exactly: same permutation (same
    seed), same per-step key-split sequence inside the scan, psum'd
    global-mean gradients per step."""
    import jax.numpy as jnp

    from ursabench_tpu.data.native import HostStreamingSplit
    from ursabench_tpu.data.transforms import ImageSpec
    from ursabench_tpu.inference.engine import make_epoch_fn
    from ursabench_tpu.inference.sgmcmc import _cosine_hyp_lr, _sghmc_hyp_update

    rng = np.random.default_rng(4)
    n, bsz = 128, 32
    images = rng.integers(0, 256, (n, 28, 28, 1), dtype=np.uint8)
    labels = rng.integers(0, 10, n).astype(np.int64)
    spec = ImageSpec(28, 1, (0.5,), (0.5,))
    module = models.get_model("MLP200MNIST").build(10)
    mesh = make_mesh(8, chain_devices=1)  # ('chain': 1, 'data': 8)
    hyp = {
        "lr0": jnp.float32(0.05), "eta_min": jnp.float32(0.0),
        "t_max": jnp.float32(10.0), "momentum": jnp.float32(0.9),
        "wd_over_n": jnp.float32(1.0 / n), "n_train": jnp.float32(n),
    }

    def run(mesh_arg, chunk_batches):
        stream = HostStreamingSplit(images, labels, batch_size=bsz, spec=spec,
                                    seed=9, chunk_batches=chunk_batches)
        fn = make_epoch_fn(module, stream, lr_fn=_cosine_hyp_lr,
                           update_fn=_sghmc_hyp_update, mesh=mesh_arg)
        state = _fresh_state(module, jax.random.PRNGKey(0), spec.shape)
        for epoch in range(2):  # noise ON: the key stream must line up too
            state, loss = fn(state, jnp.float32(epoch), jnp.float32(1.0), hyp)
        return state, loss

    st_chunked, loss_chunked = run(mesh, chunk_batches=2)
    st_single, loss_single = run(None, chunk_batches=1)
    np.testing.assert_allclose(np.asarray(loss_chunked),
                               np.asarray(loss_single), rtol=2e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(st_chunked.params),
                    jax.tree.leaves(st_single.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_mesh_sharded_config_sweep_matches_single_device():
    """VERDICT r4 item 3: K hyperparameter configs ride the mesh's 'chain'
    axis (vmap_hyp through _make_sharded_epoch_fn) and must reproduce the
    single-device MethodSweep — which is itself certified against K
    individual samplers (test_vectorized) — so mesh-sharded sweeps train
    each config under ITS OWN hyp dict with psum'd global-mean grads."""
    from ursabench_tpu.inference.vectorized import MethodSweep

    splits, C = data.loaders(
        "MNIST", None, batch_size=32, use_validation=False,
        synthetic_n_train=128, synthetic_n_test=64,
    )
    module = models.get_model("MLP200MNIST").build(C)
    hyps = [
        {"lr": lr, "prior_std": 1.0, "alpha": 0.1, "num_samples": 2,
         "burn_in_epochs": 1}
        for lr in (0.005, 0.02, 0.05, 0.1)
    ]
    mesh = make_mesh(8)  # ('chain': 2, 'data': 4); K=4 configs, 2 per row
    assert mesh.shape["data"] > 1

    def run(mesh_arg):
        sweep = MethodSweep(hyps, model=module, train=splits["train"],
                            key=jax.random.PRNGKey(6), mesh=mesh_arg)
        for _ in range(2):
            sweep._run_epoch(noise_on=True)
        return sweep

    sharded = run(mesh)
    leaf = jax.tree.leaves(sharded._state.params)[0]
    assert len(leaf.sharding.device_set) == 8  # configs x data, all devices
    single = run(None)
    for a, b in zip(jax.tree.leaves(sharded._state.params),
                    jax.tree.leaves(single._state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-5)
    # the full hyperopt surface drives through the mesh too
    from ursabench_tpu import tasks
    from ursabench_tpu.hyperopt.vectorized import vectorized_random_search

    def task_factory():
        return tasks.Prediction(
            {"in_distribution_test": splits["test"]}, C, metric_list=["ll"]
        )

    domain = [
        {"name": "lr", "type": "continuous", "domain": (1e-3, 0.1),
         "option": "logspace"},
        {"name": "prior_std", "type": "constant", "domain": 1.0},
        {"name": "alpha", "type": "constant", "domain": 0.1},
        {"name": "num_samples", "type": "constant", "domain": 1},
        {"name": "burn_in_epochs", "type": "constant", "domain": 0},
    ]
    best_hyp, best_obj, _, objs = vectorized_random_search(
        domain, module, splits["train"], task_factory, N_evaluations=4,
        seed=0, mesh=mesh,
    )
    assert len(objs) == 4 and best_obj == max(objs)
    assert np.isfinite(best_obj)
