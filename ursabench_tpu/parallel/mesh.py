"""Device-mesh parallelism for chains, data, and ensemble evaluation.

The reference has no distributed layer at all (SURVEY.md §2.9): one process,
one device, subprocess fan-out for sweeps. Here parallel MCMC chains and the
per-step data batch are first-class mesh axes:

    mesh axes: ('chain', 'data')
    - sampler state (params/momentum/batch_stats/keys) carries a leading
      chain axis sharded over 'chain'
    - the global minibatch is sharded over 'data'; each device computes
      gradients on its batch shard and the reduction over 'data' is a psum
      riding the ICI (sum-loss / psum'd count == exact global-mean gradient)

All collectives are XLA-generated from `shard_map` + `PartitionSpec` — there
is no hand-written communication layer to maintain.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.transforms import ImageSpec, normalize
from ..ops.sgmcmc import sghmc_update


def make_mesh(
    n_devices: Optional[int] = None,
    chain_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("chain", "data"),
) -> Mesh:
    """Build a ('chain', 'data') mesh over the available devices.

    ``chain_devices`` defaults to the largest power-of-two divisor <= the
    chain count the caller plans to use; with 1 device both axes are size 1.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if chain_devices is None:
        chain_devices = 1
        while chain_devices * 2 <= n and n % (chain_devices * 2) == 0:
            chain_devices *= 2
        # favor a square-ish split
        while chain_devices > 1 and chain_devices > n // chain_devices:
            chain_devices //= 2
    assert n % chain_devices == 0
    arr = np.asarray(devices).reshape(chain_devices, n // chain_devices)
    return Mesh(arr, axis_names)


def replicate_to_mesh(mesh: Mesh, *arrays):
    """Commit arrays to the mesh replicated (P()). Datasets passed as jit
    arguments must be placed once like this, or GSPMD re-broadcasts them
    from device 0 on every call of the compiled program."""
    sharding = NamedSharding(mesh, P())
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) != 1 else out[0]


def sharded_sghmc_step(
    module,
    mesh: Mesh,
    spec: ImageSpec,
    *,
    chains: int,
    n_train: int,
    lr: float = 0.01,
    momentum: float = 0.9,
    wd: float = 1.0,
):
    """Build a pjit-ed multi-chip SGHMC training step.

    NOTE: the PRODUCTION multi-chip training path is the mesh-sharded epoch
    program (`inference.engine.make_epoch_fn(mesh=...)`, reached via
    ``SGHMC(..., mesh=...)`` / ``experiment.py --mesh``), which carries the
    traced-hyp no-recompile contract. This standalone single-step builder
    (static hypers) remains as a minimal building block / teaching example.

    Layout: chain-parallel sampler states x data-parallel batch. Returns
    ``step(states, batch_x_uint8, batch_y, noise_on) -> states`` plus the
    shardings needed to place inputs. Inside the shard_map the local chain
    block vmaps over its chains; the cross-device gradient reduction over
    'data' is a single psum.
    """
    chain_shards = mesh.shape["chain"]
    assert chains % chain_shards == 0

    state_sharding = NamedSharding(mesh, P("chain"))
    batch_sharding = NamedSharding(mesh, P("data"))

    def loss_fn(params, batch_stats, x, y, dropout_key):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        logits, mutated = module.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": dropout_key},
        )
        import optax

        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        return ce.sum(), (mutated.get("batch_stats", {}), x.shape[0])

    grad_fn = jax.grad(loss_fn, has_aux=True)

    def local_step(state, x_local, y_local, noise_on, is_first):
        """Runs on one device: local chains x local batch shard."""
        params, mom, bstats, keys = state
        x = normalize(x_local, spec)
        data_idx = jax.lax.axis_index("data")

        def one_chain(p, v, b, k):
            k, k_noise, k_drop = jax.random.split(k, 3)
            # dropout masks differ per data shard (different samples) and
            # per chain/step (fresh key from the carried chain stream)
            grads, (new_b, n_local) = grad_fn(
                p, b, x, y_local, jax.random.fold_in(k_drop, data_idx)
            )
            # mean over the *global* batch: psum sums over data shards
            n_global = jax.lax.psum(jnp.asarray(n_local, jnp.float32), "data")
            grads = jax.tree.map(
                lambda g: jax.lax.psum(g, "data") / n_global, grads
            )
            # BN running stats: each shard saw only its slice; average the
            # mutated stats over 'data' so every shard carries the same,
            # whole-batch statistics (out_specs claims data-replication)
            if new_b:
                new_b = jax.tree.map(lambda s: jax.lax.pmean(s, "data"), new_b)
            p2, v2 = sghmc_update(
                p, v, grads, lr=lr, momentum=momentum, wd_over_n=wd / n_train,
                n_train=float(n_train), noise_on=noise_on,
                is_first_step=is_first, key=k_noise,
            )
            return p2, v2, new_b if new_b else b, k

        return jax.vmap(one_chain)(params, mom, bstats, keys)

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P("chain"), P("data"), P("data"), P(), P()),
        out_specs=P("chain"),
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    def step(state, x, y, noise_on, is_first=False):
        return jitted(state, x, y, jnp.asarray(noise_on, jnp.float32),
                      jnp.asarray(is_first))

    return step, state_sharding, batch_sharding


def shard_ensemble_eval(module, mesh: Mesh, has_batch_stats: bool = True):
    """BMA forward with ensemble members sharded over 'chain' and the eval
    batch sharded over 'data': returns (members, x) -> (S, B, C) logits with
    each device computing its member-block on its batch shard."""

    def member_logits(params, batch_stats, x):
        variables = {"params": params}
        if has_batch_stats and batch_stats:
            variables["batch_stats"] = batch_stats
        return module.apply(variables, x, train=False)

    def local(params, batch_stats, x):
        return jax.vmap(lambda p, b: member_logits(p, b, x))(params, batch_stats)

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("chain"), P("chain"), P("data")),
        out_specs=P("chain", "data"),
        check_vma=False,
    )
    return jax.jit(sharded)
