"""Shared fwd_bwd timing harness for the rn50 benchmarks.

rn50_decomp.py's committed decomposition row and rn50_batch_scaling.py's
bs128 cross-check must time the SAME program — both import these helpers
so the loss/fori-loop construction can't silently drift apart (r4 advisor
finding: the harness was duplicated verbatim in both files)."""


def make_grad_fn(module):
    """value_and_grad of the training loss (train mode, BN mutation)."""
    import jax
    import optax

    def loss_fn(p, b, x, y):
        variables = {"params": p}
        if b:
            variables["batch_stats"] = b
        logits, mut = module.apply(variables, x, train=True,
                                   mutable=["batch_stats"])
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        return ce.mean(), mut.get("batch_stats", {})

    return jax.value_and_grad(loss_fn, has_aux=True)


def make_fwd_bwd_k(module, k):
    """K fwd+bwd iterations inside one jitted fori_loop, every grad leaf
    kept live (keeping only one leaf lets XLA dead-code-eliminate the other
    leaves' weight-grad matmuls); single fetchable scalar output."""
    import jax
    import jax.numpy as jnp

    grad_fn = make_grad_fn(module)

    def fwd_bwd_k(params, bstats, x, y):
        def body(_, carry):
            xi, acc = carry
            (loss, _), grads = grad_fn(params, bstats, xi, y)
            gsum = sum(jnp.sum(g.astype(jnp.float32))
                       for g in jax.tree.leaves(grads))
            s = loss + jnp.float32(1e-30) * gsum
            return (x + jnp.float32(1e-30) * s, acc + s)

        return jax.lax.fori_loop(0, k, body, (x, jnp.float32(0.0)))[1]

    return jax.jit(fwd_bwd_k)


def timed_best_per_iter(fn, k, reps, *args):
    """Best-of-reps seconds per loop iteration; warmup = compile + first
    exec + one steady call, sync by device->host fetch (the only reliable
    sync over the tunnel)."""
    import time

    import jax
    import numpy as np

    np.asarray(jax.tree.leaves(fn(*args))[0])  # compile + first exec
    np.asarray(jax.tree.leaves(fn(*args))[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(fn(*args))[0])
        best = min(best, (time.perf_counter() - t0) / k)
    return best
