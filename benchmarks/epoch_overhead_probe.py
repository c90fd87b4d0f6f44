"""Epoch-harness overhead probe: which production extras cost time?

assets/gather_probe.json timed a SIMPLIFIED epoch body (compile-constant lr,
is_first_step=False, no loss output, 390 unpadded batches) at 0.657 ms/step,
while the production epoch program (assets/preresnet_decomp.json epoch_step)
measures 0.696 ms/step — a ~40 us/step gap the gather/augment ablations do
not explain. This probe ablates the production extras one at a time, all on
the shipped flat-2D gather layout (PreResNet-20/CIFAR-10 bs128 fp32):

  prod_mirror : exact mirror of engine.make_epoch_fn's body — traced-hyp
                cosine lr computed INSIDE the scan body, traced
                is_first_step=(step==0) select in sghmc_update, per-step
                loss output, nb=391 with the padded tail batch
  lr_hoist    : the per-epoch lr (cosine of `epoch` only — constant across
                batches for SGHMC) computed ONCE before the scan
  first_const : is_first_step lowered to a compile-time False
  no_loss_out : scan emits 0.0 instead of the per-step loss
  all_hoisted : all three together
  sampler     : inference.SGHMC._run_epoch cross-check in the same process

If lr_hoist or first_const wins beyond noise, engine.make_epoch_fn should
adopt the hoist (both are semantics-preserving: SGHMC/cosine lr depends only
on `epoch`, and the first-step momentum init can ride a scan-xs flag).

OUTCOME (r4): individually each extra is noise-level (lr_hoist 0.6898,
first_const 0.6884, no_loss_out 0.6825 vs prod_mirror 0.6877 ms/step); only
all three together measured -13us. A production implementation of the
semantics-preserving subset (vmapped lr as scan xs + loss-sum-in-carry +
augment-then-normalize) did NOT reproduce the win — the shipped epoch
measured 0.6963 -> 0.6997 ms/step and chains8-scan regressed ~2% — so it
was REVERTED. Conclusion: per-step harness extras sit below the ~1%
cross-process noise floor of this setup; the harness's real lower bound is
the no_permutation variant (assets/gather_probe.json, 0.650 ms/step), i.e.
shuffling+augment semantics cost ~23us/step over raw fwd+bwd+update and the
rest is irreducible at current measurement precision.

Usage: PYTHONPATH=/root/.axon_site:. python benchmarks/epoch_overhead_probe.py
"""

import json
import os
import time

import numpy as np

ASSET = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "assets",
                 "epoch_overhead_probe.json")
)

REPS = 3
EPOCHS_PER_WINDOW = 4


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from ursabench_tpu import data, inference, models
    from ursabench_tpu.data.transforms import augment_normalized, normalize
    from ursabench_tpu.inference.engine import init_variables
    from ursabench_tpu.inference.sgmcmc import _cosine_hyp_lr
    from ursabench_tpu.ops.sgmcmc import sghmc_update
    from ursabench_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    splits, C = data.loaders("CIFAR10", os.environ.get("URSA_DATA", "./data"),
                             batch_size=128, use_validation=False)
    train = splits["train"]
    images, labels = train.device_arrays()
    spec = train.spec
    n, bsz = train.n, train.batch_size
    nb = -(-n // bsz)
    pad = nb * bsz - n
    module = models.get_model("PreResNet20").build(C)
    variables = init_variables(module, jax.random.PRNGKey(0), spec.shape)
    params0 = variables["params"]
    bstats0 = variables.get("batch_stats", {})
    mom0 = jax.tree.map(jnp.zeros_like, params0)
    hyp = {
        "lr0": jnp.float32(0.01), "eta_min": jnp.float32(0.0),
        "t_max": jnp.float32(4.0), "momentum": jnp.float32(0.9),
        "wd_over_n": jnp.float32(1e-5 / n), "n_train": jnp.float32(n),
    }

    def loss_fn(p, b, x, y, k):
        logits, mut = module.apply(
            {"params": p, "batch_stats": b}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": k},
        )
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        return ce.mean(), mut.get("batch_stats", {})

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    item_shape = spec.shape

    def make_epoch(lr_hoist=False, first_const=False, loss_out=True):
        def epoch(state, images, labels, epoch_no, noise_on, hyp):
            params, mom, bstats, step, key = state
            key, k_perm, k_aug, k_noise, k_drop = jax.random.split(key, 5)
            perm = jax.random.permutation(k_perm, n)
            if pad:
                perm = jnp.concatenate([perm, perm[:pad]])
            batch_idx = perm.reshape(nb, bsz)
            flat = images.reshape(n, -1)
            if lr_hoist:
                lr_epoch = _cosine_hyp_lr(hyp, epoch_no, 0, 0)

            def body(carry, inp):
                params, mom, bstats, step = carry
                bi, idx = inp
                x = jnp.take(flat, idx, axis=0).reshape(
                    (idx.shape[0],) + item_shape)
                y = jnp.take(labels, idx, axis=0)
                x = normalize(x, spec)
                x = augment_normalized(jax.random.fold_in(k_aug, bi), x, spec)
                (loss, new_bstats), grads = grad_fn(
                    params, bstats, x, y, jax.random.fold_in(k_drop, bi))
                lr = lr_epoch if lr_hoist else _cosine_hyp_lr(
                    hyp, epoch_no, bi, step)
                params, mom = sghmc_update(
                    params, mom, grads, lr=lr, momentum=hyp["momentum"],
                    wd_over_n=hyp["wd_over_n"], n_train=hyp["n_train"],
                    noise_on=noise_on,
                    is_first_step=(False if first_const else (step == 0)),
                    key=jax.random.fold_in(k_noise, bi),
                )
                if not new_bstats:
                    new_bstats = bstats
                return ((params, mom, new_bstats, step + 1),
                        loss if loss_out else 0.0)

            init = (params, mom, bstats, step)
            (params, mom, bstats, step), losses = jax.lax.scan(
                body, init, (jnp.arange(nb), batch_idx))
            return (params, mom, bstats, step, key), jnp.mean(losses)

        return jax.jit(epoch)

    def timed(fn, *args):
        state = (params0, mom0, bstats0, jnp.int32(1), jax.random.PRNGKey(7))

        def run():
            nonlocal state
            state, _ = fn(state, images, labels, jnp.float32(1.0),
                          jnp.float32(1.0), hyp)

        run()
        np.asarray(jax.tree.leaves(state[0])[0]).sum()  # first exec + sync
        run()
        np.asarray(jax.tree.leaves(state[0])[0]).sum()
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            for _ in range(EPOCHS_PER_WINDOW):
                run()
            np.asarray(jax.tree.leaves(state[0])[0]).sum()
            best = min(best, (time.perf_counter() - t0)
                       / EPOCHS_PER_WINDOW / nb)
        return best

    out = {"device": str(jax.devices()[0]),
           "model": "PreResNet20/CIFAR10 bs128 fp32",
           "epochs_per_window": EPOCHS_PER_WINDOW, "nb": nb}

    variants = [
        ("prod_mirror", dict()),
        ("lr_hoist", dict(lr_hoist=True)),
        ("first_const", dict(first_const=True)),
        ("no_loss_out", dict(loss_out=False)),
        ("all_hoisted", dict(lr_hoist=True, first_const=True,
                             loss_out=False)),
    ]
    for name, kw in variants:
        t = timed(make_epoch(**kw))
        out[name] = {"ms_per_step": round(t * 1e3, 4),
                     "steps_per_sec": round(1 / t, 1)}
        print(name, out[name], flush=True)

    # cross-check: the shipped sampler epoch in the same process
    sampler = inference.SGHMC(
        {"lr": 0.01, "prior_std": 1.0, "num_samples": 3, "alpha": 0.1,
         "burn_in_epochs": 1},
        model=module, train=train, key=jax.random.PRNGKey(0))
    sync = lambda: np.asarray(
        jnp.sum(jax.tree.leaves(sampler._state.params)[0]))
    sampler._run_epoch(True); sync()
    sampler._run_epoch(True); sync()
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(EPOCHS_PER_WINDOW):
            sampler._run_epoch(True)
        sync()
        best = min(best, (time.perf_counter() - t0) / EPOCHS_PER_WINDOW
                   / train.num_batches)
    out["sampler"] = {"ms_per_step": round(best * 1e3, 4),
                      "steps_per_sec": round(1 / best, 1)}
    print("sampler", out["sampler"], flush=True)

    with open(ASSET, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
