"""Epoch-harness gather probe: per-batch row gather vs epoch pre-permutation.

The flagship decomposition (assets/preresnet_decomp.json) charges the gap
between fwd+bwd+update and the full epoch step to the harness: the
per-batch `jnp.take(images, idx)` gather, normalize, and the crop/flip
one-hot einsums. This probe times two semantically identical epoch
programs on the production shapes (PreResNet-20/CIFAR-10 bs128):

  take_per_batch : scan body gathers its 128 rows from the uint8 dataset
                   (the shipped engine.make_epoch_fn layout)
  pre_permuted   : one whole-dataset gather per epoch up front, reshaped to
                   (nb, bsz, H, W, C) and fed to the scan as xs (per-step
                   slicing is free; gather bytes identical in total)

  no_permutation : storage-order slices, no gather at all (bounds the
                   permutation-gather's cost)
  no_augment     : gather + normalize but no crop/flip einsums (bounds the
                   augmentation's cost)

If pre_permuted wins by more than noise, make_epoch_fn should adopt it.
Timing: device->host fetch sync; whole-epoch windows so the ~28 ms tunnel
RPC is <2% (CLAUDE.md amortization landmine).

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/gather_probe.py
"""

import json
import os
import time

import numpy as np

ASSET = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "assets",
                 "gather_probe.json")
)

REPS = 3
EPOCHS_PER_WINDOW = 4


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from ursabench_tpu import data, models
    from ursabench_tpu.data.transforms import augment_normalized, normalize
    from ursabench_tpu.inference.engine import init_variables
    from ursabench_tpu.ops.sgmcmc import sghmc_update
    from ursabench_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    splits, C = data.loaders("CIFAR10", os.environ.get("URSA_DATA", "./data"),
                             batch_size=128, use_validation=False)
    train = splits["train"]
    images, labels = train.device_arrays()
    spec = train.spec
    n, bsz = train.n, train.batch_size
    nb = n // bsz
    module = models.get_model("PreResNet20").build(C)
    variables = init_variables(module, jax.random.PRNGKey(0), spec.shape)
    params0 = variables["params"]
    bstats0 = variables.get("batch_stats", {})
    mom0 = jax.tree.map(jnp.zeros_like, params0)

    def loss_fn(p, b, x, y, k):
        logits, mut = module.apply(
            {"params": p, "batch_stats": b}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": k},
        )
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        return ce.mean(), mut.get("batch_stats", {})

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(carry, bi, x_u8, y, key, augment=True):
        p, m, b = carry
        x = normalize(x_u8, spec)
        if augment:
            x = augment_normalized(jax.random.fold_in(key, bi), x, spec)
        (_, nb_), g = grad_fn(p, b, x, y, jax.random.fold_in(key, bi + 7))
        p, m = sghmc_update(
            p, m, g, lr=jnp.float32(0.01), momentum=jnp.float32(0.9),
            wd_over_n=jnp.float32(1e-5), n_train=jnp.float32(n),
            noise_on=jnp.float32(1.0), is_first_step=False,
            key=jax.random.fold_in(key, bi + 13),
        )
        return (p, m, nb_ or b)

    def epoch_take(state, images, labels, key):
        perm = jax.random.permutation(key, n)[: nb * bsz].reshape(nb, bsz)

        def body(carry, inp):
            bi, idx = inp
            x = jnp.take(images, idx, axis=0)
            y = jnp.take(labels, idx, axis=0)
            return step(carry, bi, x, y, key), 0.0

        (p, m, b), _ = jax.lax.scan(body, state, (jnp.arange(nb), perm))
        return p, m, b

    def epoch_prepermuted(state, images, labels, key):
        perm = jax.random.permutation(key, n)[: nb * bsz]
        xs = jnp.take(images, perm, axis=0).reshape((nb, bsz) + spec.shape)
        ys = jnp.take(labels, perm, axis=0).reshape(nb, bsz)

        def body(carry, inp):
            bi, x, y = inp
            return step(carry, bi, x, y, key), 0.0

        (p, m, b), _ = jax.lax.scan(body, state, (jnp.arange(nb), xs, ys))
        return p, m, b

    def epoch_no_permutation(state, images, labels, key):
        """No gather at all: scan slices the dataset in storage order.
        Isolates the permutation-gather's cost from take_per_batch."""
        xs = images[: nb * bsz].reshape((nb, bsz) + spec.shape)
        ys = labels[: nb * bsz].reshape(nb, bsz)

        def body(carry, inp):
            bi, x, y = inp
            return step(carry, bi, x, y, key), 0.0

        (p, m, b), _ = jax.lax.scan(body, state, (jnp.arange(nb), xs, ys))
        return p, m, b

    def epoch_no_augment(state, images, labels, key):
        """Permutation gather + normalize but NO crop/flip one-hot einsums.
        Isolates the augmentation's cost from take_per_batch."""
        perm = jax.random.permutation(key, n)[: nb * bsz].reshape(nb, bsz)

        def body(carry, inp):
            bi, idx = inp
            x = jnp.take(images, idx, axis=0)
            y = jnp.take(labels, idx, axis=0)
            return step(carry, bi, x, y, key, augment=False), 0.0

        (p, m, b), _ = jax.lax.scan(body, state, (jnp.arange(nb), perm))
        return p, m, b

    def epoch_take_flat2d(state, images, labels, key):
        """Gather on a flat (n, H*W*C) uint8 view: one contiguous row per
        index may lower to a cheaper gather than the 4-D NHWC take."""
        flat = images.reshape(n, -1)
        perm = jax.random.permutation(key, n)[: nb * bsz].reshape(nb, bsz)

        def body(carry, inp):
            bi, idx = inp
            x = jnp.take(flat, idx, axis=0).reshape((bsz,) + spec.shape)
            y = jnp.take(labels, idx, axis=0)
            return step(carry, bi, x, y, key), 0.0

        (p, m, b), _ = jax.lax.scan(body, state, (jnp.arange(nb), perm))
        return p, m, b

    def epoch_take_int32(state, images, labels, key):
        """Gather int32-packed rows (4 uint8 per lane): sidesteps int8 tile
        layouts in the gather itself; unpack via bitcast after the take."""
        packed = jax.lax.bitcast_convert_type(
            images.reshape(n, -1, 4), jnp.int32)  # (n, HWC/4)
        perm = jax.random.permutation(key, n)[: nb * bsz].reshape(nb, bsz)

        def body(carry, inp):
            bi, idx = inp
            rows = jnp.take(packed, idx, axis=0)  # (bsz, HWC/4) int32
            x = jax.lax.bitcast_convert_type(rows, jnp.uint8).reshape(
                (bsz,) + spec.shape)
            y = jnp.take(labels, idx, axis=0)
            return step(carry, bi, x, y, key), 0.0

        (p, m, b), _ = jax.lax.scan(body, state, (jnp.arange(nb), perm))
        return p, m, b

    out = {"device": str(jax.devices()[0]),
           "model": "PreResNet20/CIFAR10 bs128 fp32",
           "epochs_per_window": EPOCHS_PER_WINDOW}
    for name, fn in (("take_per_batch", epoch_take),
                     ("pre_permuted", epoch_prepermuted),
                     ("no_permutation", epoch_no_permutation),
                     ("no_augment", epoch_no_augment),
                     ("take_flat2d", epoch_take_flat2d),
                     ("take_int32", epoch_take_int32)):
        jitted = jax.jit(fn)
        state = (params0, mom0, bstats0)
        key = jax.random.PRNGKey(1)
        state = jitted(state, images, labels, key)  # compile + first exec
        np.asarray(jax.tree.leaves(state[0])[0][:1])
        best = float("inf")
        for r in range(REPS):
            t0 = time.perf_counter()
            for e in range(EPOCHS_PER_WINDOW):
                state = jitted(state, images, labels,
                               jax.random.fold_in(key, r * 10 + e))
            np.asarray(jax.tree.leaves(state[0])[0][:1])
            best = min(best, (time.perf_counter() - t0)
                       / (EPOCHS_PER_WINDOW * nb))
        out[name] = {"ms_per_step": round(best * 1e3, 4),
                     "steps_per_sec": round(1 / best, 1)}
        print(name, out[name], flush=True)

    with open(ASSET, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
