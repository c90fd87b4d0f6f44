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


def make_dynamic_k_timer(reps=2):
    """Single-op timing harness shared by rn50_conv_decomp and the 1x1/stem
    lowering probe — an A/B between the two is only meaningful if both time
    the same program shape (same motivation as the fwd_bwd harness above).

    Returns timed(fn, carried, fixed, ideal_s): K applications of
    fn(carried, *fixed) inside one jitted while-loop program with K as a
    TRACED argument (one program per op, re-timed at larger K without
    recompiling). The carried tensor is perturbed by 1e-30*sum(out) each
    iteration so the body can't be hoisted out of the loop. Returns best
    seconds/iteration over ``reps`` windows of >=1.5 s actual, sync'd by a
    device->host fetch (the only reliable sync over the tunnel)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    def timed(fn, carried, fixed, ideal_s):
        def loop(c0, k, *fx):
            def body(_, carry):
                c, acc = carry
                o = fn(c, *fx)
                s = jnp.sum(o.astype(jnp.float32))
                c = c + (s * jnp.float32(1e-30)).astype(c.dtype)
                return (c, acc + s)

            return jax.lax.fori_loop(0, k, body, (c0, jnp.float32(0.0)))[1]

        jf = jax.jit(loop)
        k1 = max(4, int(0.3 / max(ideal_s, 1e-5)))
        np.asarray(jf(carried, k1, *fixed))  # compile + first exec
        t0 = time.perf_counter()
        np.asarray(jf(carried, k1, *fixed))
        per = (time.perf_counter() - t0) / k1
        k2 = max(k1, int(1.5 / per))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(jf(carried, k2, *fixed))
            best = min(best, (time.perf_counter() - t0) / k2)
        return best

    return timed


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
