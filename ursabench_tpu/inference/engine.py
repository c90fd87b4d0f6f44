"""Shared jitted training machinery for all epoch-driven samplers.

TPU-native replacement for the reference's Python hot loop
(/root/reference/URSABench/inference/sghmc.py:72-87): one epoch is a single
compiled program — ``jax.lax.scan`` over gathered permutation batches with
on-device normalization/augmentation, fused loss/grad, and the sampler's
parameter update. Multi-chain sampling vmaps the same epoch program over a
leading chain axis (per-chain PRNG streams).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..data.arrays import DataSplit
from ..data.transforms import augment_normalized, normalize
from ..util import Pytree

# Jitted program memo shared across sampler INSTANCES: hyperopt sweeps and
# the time_script protocol construct a fresh sampler per evaluation/trial
# (reference time_script.py:105-108), and without this each construction
# re-jits an identical epoch program (a full remote compile per trial on
# the TPU service). Keys are structural (flax modules hash by field
# values), data stays a jit ARGUMENT (CLAUDE.md compile-cache landmine),
# and donated state buffers belong to the caller — so sharing is safe.
_PROGRAM_CACHE: OrderedDict = OrderedDict()
_PROGRAM_CACHE_MAX = 64


def _cached_program(key, build):
    """Return the memoized jitted program for ``key``, building on miss.
    An unhashable key component (e.g. a custom module holding a list)
    skips the cache rather than failing."""
    try:
        hash(key)
    except TypeError:
        return build()
    fn = _PROGRAM_CACHE.get(key)
    if fn is None:
        fn = build()
        _PROGRAM_CACHE[key] = fn
        while len(_PROGRAM_CACHE) > _PROGRAM_CACHE_MAX:
            _PROGRAM_CACHE.popitem(last=False)
    else:
        _PROGRAM_CACHE.move_to_end(key)
    return fn


class TrainState(NamedTuple):
    params: Pytree
    momentum: Pytree
    batch_stats: Pytree  # possibly {} for BN-free models
    key: jax.Array
    step: jnp.ndarray  # global batch counter (int32)


# (params, momentum, grads, hyp, lr=, noise_on=, is_first_step=, key=)
#   -> (params, momentum)
UpdateFn = Callable[..., tuple]
# (hyp, epoch, batch_idx, global_step) -> lr scalar.
# `hyp` is a dict of traced f32 scalars so changing hyperparameters
# (update_hyp / BayesOpt loops) NEVER recompiles the epoch program.
LrFn = Callable[..., jnp.ndarray]


def init_variables(module, key: jax.Array, spec_shape, train: bool = False):
    dummy = jnp.zeros((1,) + tuple(spec_shape), jnp.float32)
    k_p, k_d = jax.random.split(key)
    return module.init({"params": k_p, "dropout": k_d}, dummy, train=train)


def cross_entropy_mean(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """torch nn.CrossEntropyLoss(reduction='mean') equivalent."""
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def _has_conv_params(module, spec_shape) -> bool:
    """True iff the abstract param tree contains 4-D kernels (flax Conv).
    Zero-FLOP probe (eval_shape) used by the chain-strategy auto rule."""
    shapes = jax.eval_shape(
        lambda k: init_variables(module, k, spec_shape),
        jax.random.PRNGKey(0),
    )
    return any(len(l.shape) == 4 for l in jax.tree.leaves(shapes["params"]))


def resolve_chain_strategy(strategy: str, module, spec_shape, mesh=None):
    """Resolve a ``chain_strategy`` of ``'auto'`` to ``'scan'`` or ``'vmap'``
    (the single shared rule — every sampler site routes through here).

    On ONE device, scan wins for conv models: vmapping chain-stacked weights
    lowers convs to grouped convolutions (8 vmapped PreResNet-20 chains
    aggregate 811 steps/s vs 1586 single-chain fp32,
    assets/preresnet_decomp.json). But when the chain axis is device-sharded
    over a mesh 'chain' axis (>1 devices and the program is jitted globally,
    not a shard_map local block), a global ``lax.scan`` over the sharded axis
    would serialize the chains ACROSS chips — there GSPMD's partitioning of
    the vmapped program is the parallel path, and each device's shard holds
    chains/chain_shards chains so the grouped-conv penalty is bounded by the
    local block, not the global chain count. Pass ``mesh=None`` when deciding
    a shard_map-local advance (the local block is unsharded)."""
    if strategy != "auto":
        return strategy
    if mesh is not None and mesh.shape.get("chain", 1) > 1:
        return "vmap"
    return "scan" if _has_conv_params(module, spec_shape) else "vmap"


def make_epoch_fn(
    module,
    split: DataSplit,
    *,
    lr_fn: LrFn,
    update_fn: UpdateFn,
    use_augment: bool = True,
    chains: int = 1,
    mesh=None,
    vmap_hyp: bool = False,
    chain_strategy: str = "auto",
):
    """Build ``epoch_fn(state, epoch, noise_on, hyp) -> (state, mean_loss)``:
    one full shuffled epoch as a single jitted scan, with all continuous
    hyperparameters flowing through the traced ``hyp`` dict (compile once
    per sampler instance; hyperopt sweeps pay zero recompiles). With
    ``chains > 1`` the state carries a leading chain axis and the whole
    epoch program advances every chain in one device program —
    ``chain_strategy`` picks how: ``"vmap"`` batches chain-stacked weights
    (XLA lowers the convs to grouped convolutions — slow for conv models:
    8 vmapped PreResNet-20 chains aggregate 811 steps/s vs 1586 single-chain
    fp32, assets/preresnet_decomp.json), ``"scan"`` advances the chains
    sequentially inside one ``lax.scan`` reusing the single-chain kernels,
    and ``"auto"`` (default) picks scan iff the model has conv kernels —
    the chain-axis mirror of the ensemble engines' ``member_strategy``
    rule (profiling/latency.py:55-66) — EXCEPT when the chain axis is
    device-sharded over a chain-only mesh, where vmap is the parallel path
    (resolve_chain_strategy docstring). ``vmap_hyp=True`` additionally maps the hyp dict's
    leaves over the same leading axis: the chain axis becomes a CONFIG
    axis (each "chain" trains under its own hyperparameters — the
    vectorized-sweep machinery, inference/vectorized.py).

    With a ('chain', 'data') ``mesh`` whose data axis is >1, the SAME epoch
    protocol becomes a shard_map program: chain states sharded over 'chain',
    each global minibatch computed shard-wise over 'data' with one psum for
    the exact global-mean gradient (the production multi-chip path — the
    traced-hyp contract is identical, so update_hyp never recompiles here
    either)."""
    data_mesh = (mesh is not None and "data" in mesh.shape
                 and mesh.shape["data"] > 1)
    if hasattr(split, "epoch"):  # HostStreamingSplit: beyond-HBM datasets
        # same epoch_fn contract, but batches stream from the C++ host
        # pipeline (data/native.py) through the single-batch jitted step —
        # any epoch-driven sampler takes a streaming split transparently.
        # With a data mesh each streamed GLOBAL batch is device_put sharded
        # over 'data' and the step psums the exact global-mean gradient
        # (the ImageNet-scale config: beyond-HBM data * multi-chip).
        assert chains == 1 and not vmap_hyp, (
            "host-streaming epochs are single-chain"
        )
        assert split.num_batches > 0, (
            f"streaming split has {split.n} samples < one batch "
            f"({split.batch_size}) — no batches to train on"
        )
        chunked = getattr(split, "chunk_batches", 1) > 1
        if data_mesh:
            assert mesh.shape.get("chain", 1) == 1, (
                "streamed epochs shard over 'data' only (chain axis must be 1)"
            )
            assert split.batch_size % mesh.shape["data"] == 0, (
                (split.batch_size, mesh.shape["data"])
            )
            maker = (make_sharded_streaming_chunk_fn if chunked
                     else make_sharded_streaming_step_fn)
            step = maker(
                module, mesh, lr_fn=lr_fn, update_fn=update_fn,
                spec=split.spec, augment=use_augment,
            )
            batch_sharding = step._batch_sharding
        else:
            assert mesh is None, "streaming meshes must have a 'data' axis > 1"
            maker = (make_streaming_chunk_fn if chunked
                     else make_streaming_step_fn)
            step = maker(
                module, lr_fn=lr_fn, update_fn=update_fn,
                spec=split.spec, augment=use_augment,
            )
            batch_sharding = None

        def streaming_epoch_fn(state, epoch, noise_on, hyp):
            state, losses = run_streaming_epoch(
                step, state, split, epoch, noise_on, hyp,
                sharding=batch_sharding,
            )
            return state, jnp.stack(losses).mean()

        streaming_epoch_fn._cache_size = step._cache_size
        return streaming_epoch_fn
    if data_mesh:
        return _make_sharded_epoch_fn(
            module, split, lr_fn=lr_fn, update_fn=update_fn,
            use_augment=use_augment, chains=chains, mesh=mesh,
            chain_strategy=chain_strategy, vmap_hyp=vmap_hyp,
        )
    assert not (vmap_hyp and chains == 1), "vmap_hyp requires chains/K > 1"
    images, labels = split.device_arrays()
    spec = split.spec
    n = split.n
    bsz = split.batch_size
    nb = -(-n // bsz)
    pad = nb * bsz - n

    def loss_fn(params, batch_stats, x, y, dropout_key):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        logits, mutated = module.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": dropout_key},
        )
        return cross_entropy_mean(logits, y), mutated.get("batch_stats", {})

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def epoch_impl(state: TrainState, images, labels, epoch: jnp.ndarray,
                   noise_on: jnp.ndarray, hyp: dict):
        key, k_perm, k_aug, k_noise, k_drop = jax.random.split(state.key, 5)
        perm = jax.random.permutation(k_perm, n)
        if pad:
            perm = jnp.concatenate([perm, perm[:pad]])
        batch_idx = perm.reshape(nb, bsz)
        # flat-2D gather view, hoisted OUTSIDE the scan body: one contiguous
        # row per index lowers to a cheaper gather than the 4-D NHWC take
        # (assets/gather_probe.json take_flat2d 0.657 vs 0.662 ms/step), but
        # a reshape INSIDE the body re-materializes the whole dataset every
        # step (measured 0.69 -> 1.33 ms/step)
        item_shape = images.shape[1:]
        flat = images.reshape(n, -1)

        def body(carry, inp):
            params, mom, bstats, step = carry
            bi, idx = inp
            x = jnp.take(flat, idx, axis=0).reshape(
                (idx.shape[0],) + item_shape)
            y = jnp.take(labels, idx, axis=0)
            # normalize BEFORE augmenting: gather/flip on uint8 hits
            # pathological int8 tile layouts on TPU (~600x slower measured);
            # augment_normalized preserves zero-pixel padding semantics
            x = normalize(x, spec)
            if use_augment and (spec.random_crop_pad or spec.random_flip):
                x = augment_normalized(jax.random.fold_in(k_aug, bi), x, spec)
            (loss, new_bstats), grads = grad_fn(
                params, bstats, x, y, jax.random.fold_in(k_drop, bi)
            )
            lr = lr_fn(hyp, epoch, bi, step)
            params, mom = update_fn(
                params, mom, grads, hyp,
                lr=lr, noise_on=noise_on,
                is_first_step=(step == 0),
                key=jax.random.fold_in(k_noise, bi),
            )
            if not new_bstats:
                new_bstats = bstats
            return (params, mom, new_bstats, step + 1), loss

        init = (state.params, state.momentum, state.batch_stats, state.step)
        (params, mom, bstats, step), losses = jax.lax.scan(
            body, init, (jnp.arange(nb), batch_idx)
        )
        return TrainState(params, mom, bstats, key, step), losses.mean()

    # data enters as jit ARGUMENTS, not closure constants: a closed-over
    # dataset is baked into the executable (612MB persistent-cache entries
    # for CIFAR, recompile on any data change); as arguments the compiled
    # program is shape-only and the compilation cache survives across
    # datasets and processes.
    hyp_axis = 0 if vmap_hyp else None
    strategy = chain_strategy
    if chains == 1:
        fn = epoch_impl
        strategy = None
    else:
        strategy = resolve_chain_strategy(strategy, module, spec.shape, mesh)
        if strategy == "vmap":
            fn = jax.vmap(epoch_impl, in_axes=(0, None, None, None, None,
                                               hyp_axis))
        else:
            assert strategy == "scan", strategy

            def fn(state, images, labels, epoch, noise_on, hyp):
                def body(_, xs):
                    st, h = xs if vmap_hyp else (xs, hyp)
                    out = epoch_impl(st, images, labels, epoch, noise_on, h)
                    return None, out

                xs = (state, hyp) if vmap_hyp else state
                _, (new_state, losses) = jax.lax.scan(body, None, xs)
                return new_state, losses

    key = ("epoch", module, spec, n, bsz, str(images.dtype),
           str(labels.dtype), lr_fn, update_fn, use_augment, chains,
           vmap_hyp, strategy)
    jitted = _cached_program(key, lambda: jax.jit(fn, donate_argnums=(0,)))

    def epoch_fn(state, epoch, noise_on, hyp):
        return jitted(state, images, labels, epoch, noise_on, hyp)

    epoch_fn._cache_size = jitted._cache_size  # no-recompile tests probe this
    epoch_fn._chain_strategy = strategy  # resolved 'auto' (None if chains==1)
    return epoch_fn


def _make_sharded_epoch_fn(
    module,
    split: DataSplit,
    *,
    lr_fn: LrFn,
    update_fn: UpdateFn,
    use_augment: bool,
    chains: int,
    mesh,
    chain_strategy: str = "auto",
    vmap_hyp: bool = False,
):
    """('chain', 'data')-sharded variant of the epoch program (multi-chip
    SGHMC as a first-class sampler mode, not a demo step).

    ``vmap_hyp=True`` turns the chain axis into a CONFIG axis exactly as in
    the single-device epoch (make_epoch_fn docstring): the hyp dict's
    leaves carry a leading ``chains`` axis SHARDED over 'chain', so K
    hyperparameter configurations train chip-parallel — the mesh half of
    SURVEY §2.9's config-parallelism row (the reference fans out one OS
    process per config, hyper_optimization.py:171-201; here the configs
    ride the same collective-free chain rows as sampler chains do, each
    row's batch optionally data-sharded over 'data').

    Semantics match the single-device epoch exactly: per-chain permutation
    streams (the permutation key is chain state, identical across a chain's
    data shards, so every shard sees the same batch plan), global-mean
    gradients via one psum over 'data', identical noise keys across shards
    (the update stays replicated within a chain row), per-shard dropout /
    augmentation randomness (different samples get different masks). BN
    batch stats are pmean'd over 'data' so each chain carries whole-batch
    statistics. The reference has no counterpart (SURVEY.md §2.9: no
    distributed layer at all); collectives are XLA-generated from shard_map.
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import replicate_to_mesh

    images, labels = replicate_to_mesh(mesh, *split.device_arrays())
    spec = split.spec
    n = split.n
    bsz = split.batch_size
    nb = -(-n // bsz)
    pad = nb * bsz - n
    chain_shards = mesh.shape["chain"]
    data_shards = mesh.shape["data"]
    assert chains % chain_shards == 0, (chains, chain_shards)
    assert not (vmap_hyp and chains == 1), "vmap_hyp requires chains/K > 1"
    assert bsz % data_shards == 0, (bsz, data_shards)
    local_bsz = bsz // data_shards
    # chains_per_device > 1 blocks hit the same grouped-convolution
    # pathology as the single-chip vmap (make_epoch_fn docstring): scan
    # the local chain block for conv models
    # local (per-device) decision: the shard_map block is unsharded, so the
    # one-device rule applies regardless of how many devices hold chains
    chain_strategy = resolve_chain_strategy(chain_strategy, module, spec.shape)

    def loss_fn(params, batch_stats, x, y, dropout_key):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        logits, mutated = module.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": dropout_key},
        )
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        # sum + shard count: the psum'd pair reconstructs the global mean
        return ce.sum(), mutated.get("batch_stats", {})

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    n_global = float(bsz)

    def local_epoch(state: TrainState, images, labels, epoch, noise_on, hyp):
        data_idx = jax.lax.axis_index("data")

        def one_chain(st: TrainState, hyp: dict):
            key, k_perm, k_aug, k_noise, k_drop = jax.random.split(st.key, 5)
            perm = jax.random.permutation(k_perm, n)
            if pad:
                perm = jnp.concatenate([perm, perm[:pad]])
            batch_idx = perm.reshape(nb, bsz)
            # flat-2D gather view hoisted OUTSIDE the scan body (same
            # lowering win + same in-body-reshape trap as the single-device
            # epoch; assets/gather_probe.json)
            item_shape = images.shape[1:]
            flat = images.reshape(images.shape[0], -1)

            def body(carry, inp):
                params, mom, bstats, step = carry
                bi, idx = inp
                idx_local = jax.lax.dynamic_slice(
                    idx, (data_idx * local_bsz,), (local_bsz,)
                )
                x = jnp.take(flat, idx_local, axis=0).reshape(
                    (local_bsz,) + item_shape)
                y = jnp.take(labels, idx_local, axis=0)
                x = normalize(x, spec)
                if use_augment and (spec.random_crop_pad or spec.random_flip):
                    # different samples on each shard -> per-shard aug stream
                    x = augment_normalized(
                        jax.random.fold_in(jax.random.fold_in(k_aug, bi), data_idx),
                        x, spec,
                    )
                (loss_sum, new_bstats), grads = grad_fn(
                    params, bstats, x, y,
                    jax.random.fold_in(jax.random.fold_in(k_drop, bi), data_idx),
                )
                grads = jax.tree.map(
                    lambda g: jax.lax.psum(g, "data") / n_global, grads
                )
                loss = jax.lax.psum(loss_sum, "data") / n_global
                if new_bstats:
                    new_bstats = jax.tree.map(
                        lambda s: jax.lax.pmean(s, "data"), new_bstats
                    )
                else:
                    new_bstats = bstats
                lr = lr_fn(hyp, epoch, bi, step)
                params, mom = update_fn(
                    params, mom, grads, hyp,
                    lr=lr, noise_on=noise_on,
                    is_first_step=(step == 0),
                    key=jax.random.fold_in(k_noise, bi),
                )
                return (params, mom, new_bstats, step + 1), loss

            init = (st.params, st.momentum, st.batch_stats, st.step)
            (params, mom, bstats, step), losses = jax.lax.scan(
                body, init, (jnp.arange(nb), batch_idx)
            )
            return TrainState(params, mom, bstats, key, step), losses.mean()

        if chains == 1:  # pure data parallelism: unstacked, replicated state
            return one_chain(state, hyp)
        hyp_axis = 0 if vmap_hyp else None
        if chain_strategy == "vmap":
            return jax.vmap(one_chain, in_axes=(0, hyp_axis))(state, hyp)

        def chain_body(_, xs):
            st, h = xs if vmap_hyp else (xs, hyp)
            return None, one_chain(st, h)

        xs = (state, hyp) if vmap_hyp else state
        _, (new_state, losses) = jax.lax.scan(chain_body, None, xs)
        return new_state, losses

    state_spec = P("chain") if chains > 1 else P()
    hyp_spec = P("chain") if (vmap_hyp and chains > 1) else P()

    def _build():
        sharded = jax.shard_map(
            local_epoch,
            mesh=mesh,
            in_specs=(state_spec, P(), P(), P(), P(), hyp_spec),
            out_specs=(state_spec, state_spec),
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(0,))

    key = ("sharded_epoch", module, spec, n, bsz, str(images.dtype),
           str(labels.dtype), lr_fn, update_fn, use_augment, chains,
           chain_strategy, vmap_hyp, mesh)
    jitted = _cached_program(key, _build)

    # data as jit arguments (not closure constants): keeps the compiled
    # program shape-only — see make_epoch_fn
    def epoch_fn(state, epoch, noise_on, hyp):
        return jitted(state, images, labels, epoch, noise_on, hyp)

    epoch_fn._cache_size = jitted._cache_size  # no-recompile tests probe this
    epoch_fn._chain_strategy = chain_strategy if chains > 1 else None
    return epoch_fn


def _stream_step_impl(module, spec, do_augment, lr_fn, update_fn):
    """Shared single-batch streamed-step body: the per-batch fn and the
    chunked scan (stage-to-HBM) compile the SAME training semantics."""

    def loss_fn(params, batch_stats, x, y, dropout_key):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        logits, mutated = module.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": dropout_key},
        )
        return cross_entropy_mean(logits, y), mutated.get("batch_stats", {})

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step_impl(state: TrainState, x, y, epoch, batch_idx, noise_on, hyp):
        key, k_noise, k_drop, k_aug = jax.random.split(state.key, 4)
        if jnp.issubdtype(x.dtype, jnp.integer):  # uint8 transfer mode
            assert spec is not None, "uint8 streamed batches need a spec"
            x = normalize(x, spec)
        if do_augment:
            x = augment_normalized(k_aug, x, spec)
        (loss, new_bstats), grads = grad_fn(
            state.params, state.batch_stats, x, y, k_drop
        )
        lr = lr_fn(hyp, epoch, batch_idx, state.step)
        params, mom = update_fn(
            state.params, state.momentum, grads, hyp,
            lr=lr, noise_on=noise_on, is_first_step=(state.step == 0),
            key=k_noise,
        )
        if not new_bstats:
            new_bstats = state.batch_stats
        return TrainState(params, mom, new_bstats, key, state.step + 1), loss

    return step_impl


def make_streaming_step_fn(module, *, lr_fn: LrFn, update_fn: UpdateFn,
                           spec=None, augment=True):
    """Single-batch jitted training step for host-streamed data (datasets
    too large for HBM): the C++ pipeline (data/native.HostStreamingSplit)
    gathers on the host and double-buffers device transfers; this step
    consumes one batch at a time. A raw uint8 batch (the split's default
    ``transfer_dtype='uint8'`` — 4x fewer transferred bytes) is normalized
    ON DEVICE with the same ``normalize()`` as the in-HBM epoch path; a
    float32 batch is taken as already host-normalized. Pass the split's
    ``spec`` to normalize and (with ``augment=True``) apply random
    crop/flip on device. Signature:
    ``step(state, x, y, epoch, batch_idx, noise_on, hyp) -> (state, loss)``.
    """
    do_augment = (augment and spec is not None
                  and (spec.random_crop_pad or spec.random_flip))
    step_impl = _stream_step_impl(module, spec, do_augment, lr_fn, update_fn)
    key = ("stream_step", module, lr_fn, update_fn, spec, do_augment)
    return _cached_program(key, lambda: jax.jit(step_impl))


def make_streaming_chunk_fn(module, *, lr_fn: LrFn, update_fn: UpdateFn,
                            spec=None, augment=True):
    """Chunked (stage-to-HBM) streaming: one jitted ``lax.scan`` trains on a
    whole staged chunk of M batches — ``chunk(state, x:(M,B,...), y:(M,B),
    epoch, chunk_idx, noise_on, hyp) -> (state, mean_loss)``. For datasets
    that exceed HBM but whose chunks don't, this amortizes the per-step
    dispatch (one device program per M steps instead of per step) while the
    host stream gathers + transfers chunk k+1 during chunk k's scan. Step
    semantics are ``make_streaming_step_fn``'s body, scanned."""
    do_augment = (augment and spec is not None
                  and (spec.random_crop_pad or spec.random_flip))
    step_impl = _stream_step_impl(module, spec, do_augment, lr_fn, update_fn)

    def chunk_impl(state: TrainState, x, y, epoch, chunk_idx, noise_on, hyp):
        m = x.shape[0]

        def body(st, inp):
            xi, yi, j = inp
            st, loss = step_impl(st, xi, yi, epoch, chunk_idx * m + j,
                                 noise_on, hyp)
            return st, loss

        state, losses = jax.lax.scan(body, state, (x, y, jnp.arange(m)))
        return state, losses.mean()

    key = ("stream_chunk", module, lr_fn, update_fn, spec, do_augment)
    return _cached_program(
        key, lambda: jax.jit(chunk_impl, donate_argnums=(0,)))


def make_sharded_streaming_step_fn(module, mesh, *, lr_fn: LrFn,
                                   update_fn: UpdateFn, spec=None,
                                   augment=True):
    """Data-parallel single-batch training step for host-streamed data:
    the streamed global batch arrives sharded over the mesh 'data' axis
    (``step._batch_sharding`` — the stream device_puts straight into that
    layout, one shard per chip) and one psum reconstructs the exact
    global-mean gradient, so streamed+sharded training matches the in-HBM
    sharded epoch semantics (`_make_sharded_epoch_fn`). State is replicated;
    the update uses one noise/key stream so every shard computes the same
    parameters. Augmentation/dropout randomness is per-shard (different
    samples get different masks)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    do_augment = (augment and spec is not None
                  and (spec.random_crop_pad or spec.random_flip))
    data_shards = mesh.shape["data"]
    local_step = _sharded_stream_step_impl(
        module, spec, do_augment, lr_fn, update_fn, data_shards)

    def _build():
        sharded = jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P(), P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        step = jax.jit(sharded, donate_argnums=(0,))
        step._batch_sharding = NamedSharding(mesh, P("data"))
        return step

    key = ("sharded_stream_step", module, lr_fn, update_fn, spec,
           do_augment, mesh)
    return _cached_program(key, _build)


def _sharded_stream_step_impl(module, spec, do_augment, lr_fn, update_fn,
                              data_shards):
    """Shared shard_map-local streamed-step body (per-batch and chunked
    sharded streaming compile the same training semantics)."""

    def loss_fn(params, batch_stats, x, y, dropout_key):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        logits, mutated = module.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": dropout_key},
        )
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        # sum + global count: the psum'd pair reconstructs the global mean
        return ce.sum(), mutated.get("batch_stats", {})

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def local_step(state: TrainState, x, y, epoch, batch_idx, noise_on, hyp):
        data_idx = jax.lax.axis_index("data")
        key, k_noise, k_drop, k_aug = jax.random.split(state.key, 4)
        if jnp.issubdtype(x.dtype, jnp.integer):  # uint8 transfer mode
            assert spec is not None, "uint8 streamed batches need a spec"
            x = normalize(x, spec)
        if do_augment:
            x = augment_normalized(jax.random.fold_in(k_aug, data_idx), x, spec)
        (loss_sum, new_bstats), grads = grad_fn(
            state.params, state.batch_stats, x, y,
            jax.random.fold_in(k_drop, data_idx),
        )
        n_global = float(x.shape[0] * data_shards)
        # psum of local grads, never grad-through-psum (CLAUDE.md invariant)
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g, "data") / n_global, grads
        )
        loss = jax.lax.psum(loss_sum, "data") / n_global
        if new_bstats:
            new_bstats = jax.tree.map(
                lambda s: jax.lax.pmean(s, "data"), new_bstats
            )
        else:
            new_bstats = state.batch_stats
        lr = lr_fn(hyp, epoch, batch_idx, state.step)
        params, mom = update_fn(
            state.params, state.momentum, grads, hyp,
            lr=lr, noise_on=noise_on, is_first_step=(state.step == 0),
            key=k_noise,
        )
        return TrainState(params, mom, new_bstats, key, state.step + 1), loss

    return local_step


def make_sharded_streaming_chunk_fn(module, mesh, *, lr_fn: LrFn,
                                    update_fn: UpdateFn, spec=None,
                                    augment=True):
    """Data-parallel chunked streaming: the staged chunk arrives sharded
    over 'data' on its BATCH axis (axis 1 — ``chunk._batch_sharding`` is
    P(None, 'data')) and one shard_map scan trains the M steps with a psum'd
    global-mean gradient per step — ``make_sharded_streaming_step_fn``
    semantics, dispatch amortized M-fold (the beyond-HBM multi-chip path at
    full rate)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    do_augment = (augment and spec is not None
                  and (spec.random_crop_pad or spec.random_flip))
    data_shards = mesh.shape["data"]
    local_step = _sharded_stream_step_impl(
        module, spec, do_augment, lr_fn, update_fn, data_shards)

    def local_chunk(state: TrainState, x, y, epoch, chunk_idx, noise_on, hyp):
        m = x.shape[0]

        def body(st, inp):
            xi, yi, j = inp
            st, loss = local_step(st, xi, yi, epoch, chunk_idx * m + j,
                                  noise_on, hyp)
            return st, loss

        state, losses = jax.lax.scan(body, state, (x, y, jnp.arange(m)))
        return state, losses.mean()

    def _build():
        sharded = jax.shard_map(
            local_chunk,
            mesh=mesh,
            in_specs=(P(), P(None, "data"), P(None, "data"), P(), P(), P(),
                      P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        chunk = jax.jit(sharded, donate_argnums=(0,))
        chunk._batch_sharding = NamedSharding(mesh, P(None, "data"))
        return chunk

    key = ("sharded_stream_chunk", module, lr_fn, update_fn, spec,
           do_augment, mesh)
    return _cached_program(key, _build)


def run_streaming_epoch(step_fn, state: TrainState, stream, epoch: int,
                        noise_on: float, hyp: dict, sharding=None):
    """Drive one epoch from a HostStreamingSplit: host gather of batch i+1
    overlaps device compute of batch i (the stream double-buffers). With a
    ``sharding`` each streamed batch lands on the mesh pre-sharded over
    'data' (the beyond-HBM multi-chip path)."""
    losses = []
    for bi, (x, y) in enumerate(stream.epoch(sharding=sharding)):
        state, loss = step_fn(
            state, x, y, jnp.asarray(float(epoch)), jnp.asarray(bi),
            jnp.asarray(noise_on), hyp,
        )
        losses.append(loss)
    return state, losses


def make_bn_refresh_fn(module, split: DataSplit):
    """Recompute BatchNorm running buffers with one exact full-epoch pass
    (reference ``bn_update``, /root/reference/URSABench/util.py:212-247:
    the b/(n+b) momentum trick computes the batch-size-weighted average of
    batch statistics — equivalently one scan with cumulative weighting)."""
    images, labels = split.device_arrays()
    del labels
    spec = split.spec
    n = split.n
    bsz = split.batch_size
    nb = -(-n // bsz)
    pad = nb * bsz - n

    def refresh_impl(params: Pytree, batch_stats: Pytree, images) -> Pytree:
        if not batch_stats:
            return batch_stats
        idx = jnp.arange(n)
        if pad:
            idx = jnp.concatenate([idx, idx[:pad]])
        batches = idx.reshape(nb, bsz)

        def train_apply(stats, x):
            _, mutated = module.apply(
                {"params": params, "batch_stats": stats},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            return mutated["batch_stats"]

        # flax BatchNorm writes fresh = m*old + (1-m)*batch with a static,
        # possibly per-layer momentum (e.g. the WRN head uses 0.1 where the
        # rest use 0.9). In train mode the batch statistic is independent of
        # the old running stats, so two probe applies with old=0 and old=1
        # recover m per leaf exactly: m = f(old=1) - f(old=0).
        x0 = normalize(jnp.take(images, batches[0], axis=0), spec)
        zeros = jax.tree.map(jnp.zeros_like, batch_stats)
        ones = jax.tree.map(jnp.ones_like, batch_stats)
        f0 = train_apply(zeros, x0)
        f1 = train_apply(ones, x0)
        momentum = jax.tree.map(lambda a, b: b - a, f0, f1)

        def body_exact(carry, b_idx):
            stats, count = carry
            x = normalize(jnp.take(images, b_idx, axis=0), spec)
            b = float(bsz)
            fresh = train_apply(stats, x)
            batch_stat = jax.tree.map(
                lambda f, o, m: (f - m * o) / (1.0 - m),
                fresh, stats, momentum,
            )
            w_old = count / (count + b)
            stats = jax.tree.map(
                lambda o, bs: w_old * o + (1.0 - w_old) * bs, stats, batch_stat
            )
            return (stats, count + b), None

        zeroed = jax.tree.map(jnp.zeros_like, batch_stats)
        # running_var must reset to 1 (util.py:196-199)
        zeroed = _reset_var_to_one(zeroed)
        (stats, _), _ = jax.lax.scan(body_exact, (zeroed, 0.0), batches)
        return stats

    key = ("bn_refresh", module, spec, n, bsz, str(images.dtype))
    jitted = _cached_program(key, lambda: jax.jit(refresh_impl))

    # data as a jit argument (not a closure constant) — see make_epoch_fn
    def refresh(params: Pytree, batch_stats: Pytree) -> Pytree:
        return jitted(params, batch_stats, images)

    return refresh


def _reset_var_to_one(batch_stats: Pytree) -> Pytree:
    """Set leaves named 'var' to ones (BN reset semantics)."""
    import flax

    flat = flax.traverse_util.flatten_dict(batch_stats)
    for k in list(flat):
        if k[-1] == "var":
            flat[k] = jnp.ones_like(flat[k])
    return flax.traverse_util.unflatten_dict(flat)


def make_eval_loss_fn(module, split: DataSplit):
    """Mean CE over a validation split in eval mode
    (reference ``compute_val_loss``, inference_base.py:46-56)."""
    images, labels = split.device_arrays()
    spec = split.spec
    n = split.n
    bsz = split.batch_size
    nb = -(-n // bsz)
    pad = nb * bsz - n

    def val_loss_impl(params, batch_stats, images, labels):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        idx = jnp.arange(n)
        if pad:
            idx = jnp.concatenate([idx, jnp.full((pad,), -1)])
        batches = idx.reshape(nb, bsz)

        def body(total, b_idx):
            valid = b_idx >= 0
            x = normalize(jnp.take(images, jnp.maximum(b_idx, 0), axis=0), spec)
            y = jnp.take(labels, jnp.maximum(b_idx, 0), axis=0)
            logits = module.apply(
                variables, x, train=False,
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return total + jnp.sum(ce * valid), None

        total, _ = jax.lax.scan(body, 0.0, batches)
        return total / n

    key = ("val_loss", module, spec, n, bsz, str(images.dtype),
           str(labels.dtype))
    jitted = _cached_program(key, lambda: jax.jit(val_loss_impl))

    # data as jit arguments (not closure constants) — see make_epoch_fn
    def val_loss(params, batch_stats):
        return jitted(params, batch_stats, images, labels)

    return val_loss
