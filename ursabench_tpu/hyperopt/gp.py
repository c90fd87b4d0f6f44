"""Exact Gaussian process for Bayesian optimization — pure JAX.

Replaces the reference's botorch SingleTaskGP + gpytorch stack
(/root/reference/URSABench/hyperopt/hyper_optimization.py:451-473):
Matern-5/2 ARD kernel, Gaussian likelihood with a noise floor (the
reference's GreaterThan(1e-3) constraint), Y standardization, and marginal
log-likelihood fitting by Adam — everything jitted, so a GP refit is a few
milliseconds. UCB acquisition (beta=0.1 default, :348-352) is optimized by
random candidates + gradient ascent with bound clipping.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

MIN_NOISE = 1e-3  # reference MIN_INFERRED_NOISE_LEVEL (:456)
JITTER = 1e-6


class GPParams(NamedTuple):
    raw_lengthscale: jnp.ndarray  # (d,)
    raw_outputscale: jnp.ndarray  # ()
    raw_noise: jnp.ndarray  # ()


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


def init_params(d: int) -> GPParams:
    return GPParams(
        raw_lengthscale=jnp.zeros(d),
        raw_outputscale=jnp.asarray(0.5),
        raw_noise=jnp.asarray(-2.0),
    )


def _matern52(x1, x2, lengthscale, outputscale):
    """Matern-5/2 ARD kernel matrix for (n,d) x (m,d)."""
    scaled1 = x1 / lengthscale
    scaled2 = x2 / lengthscale
    d2 = jnp.maximum(
        jnp.sum(scaled1 ** 2, -1)[:, None]
        + jnp.sum(scaled2 ** 2, -1)[None, :]
        - 2.0 * scaled1 @ scaled2.T,
        0.0,
    )
    r = jnp.sqrt(d2 + 1e-12)
    sqrt5r = jnp.sqrt(5.0) * r
    return outputscale * (1 + sqrt5r + 5.0 / 3.0 * d2) * jnp.exp(-sqrt5r)


def _transform(p: GPParams):
    return (
        _softplus(p.raw_lengthscale) + 1e-4,
        _softplus(p.raw_outputscale) + 1e-4,
        _softplus(p.raw_noise) + MIN_NOISE,
    )


def neg_mll(p: GPParams, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    ls, os_, noise = _transform(p)
    n = x.shape[0]
    k = _matern52(x, x, ls, os_) + (noise + JITTER) * jnp.eye(n)
    chol = jnp.linalg.cholesky(k)
    alpha = jax.scipy.linalg.cho_solve((chol, True), y)
    return 0.5 * y @ alpha + jnp.sum(jnp.log(jnp.diag(chol))) + 0.5 * n * jnp.log(
        2 * jnp.pi
    )


@partial(jax.jit, static_argnames=("steps",))
def fit(x: jnp.ndarray, y: jnp.ndarray, p0: GPParams, steps: int = 200):
    """Adam on the negative marginal log-likelihood; warm-startable via p0
    (mirrors the reference's state_dict warm start, :551)."""
    opt = optax.adam(5e-2)

    def step(carry, _):
        p, s = carry
        g = jax.grad(neg_mll)(p, x, y)
        updates, s = opt.update(g, s, p)
        return (optax.apply_updates(p, updates), s), None

    (p, _), _ = jax.lax.scan(step, (p0, opt.init(p0)), None, length=steps)
    return p


@jax.jit
def posterior(p: GPParams, x: jnp.ndarray, y: jnp.ndarray, xq: jnp.ndarray):
    """Posterior mean/std at query points xq."""
    ls, os_, noise = _transform(p)
    n = x.shape[0]
    k = _matern52(x, x, ls, os_) + (noise + JITTER) * jnp.eye(n)
    chol = jnp.linalg.cholesky(k)
    kq = _matern52(xq, x, ls, os_)
    alpha = jax.scipy.linalg.cho_solve((chol, True), y)
    mean = kq @ alpha
    v = jax.scipy.linalg.solve_triangular(chol, kq.T, lower=True)
    var = jnp.maximum(os_ - jnp.sum(v ** 2, axis=0), 1e-12)
    return mean, jnp.sqrt(var)


def standardize(y: jnp.ndarray):
    """botorch.utils.standardize equivalent (:467)."""
    mu = y.mean()
    sd = jnp.where(y.shape[0] > 1, y.std(ddof=1), 1.0)
    sd = jnp.where(sd < 1e-9, 1.0, sd)
    return (y - mu) / sd


class GP:
    """Stateful wrapper: fit on (X, Y), expose UCB optimization."""

    def __init__(self, x: jnp.ndarray, y: jnp.ndarray, p0: GPParams | None = None):
        self.x = jnp.asarray(x, jnp.float32)
        self.y = standardize(jnp.asarray(y, jnp.float32).reshape(-1))
        d = self.x.shape[1]
        self.params = fit(self.x, self.y, p0 if p0 is not None else init_params(d))

    def ucb(self, xq: jnp.ndarray, beta: float = 0.1) -> jnp.ndarray:
        mean, std = posterior(self.params, self.x, self.y, xq)
        return mean + jnp.sqrt(beta) * std

    def _ascend_from_candidates(self, bounds, key, beta, raw_samples,
                                num_restarts, ascent_steps):
        """Random candidates -> top-k -> jitted Adam ascent with clipping
        (mirrors gen_batch_initial_conditions + optimize_acqf, :441-449).
        Returns (endpoints, ucb values) over the num_restarts restarts."""
        lo, hi = bounds[:, 0], bounds[:, 1]
        d = bounds.shape[0]
        cand = lo + (hi - lo) * jax.random.uniform(key, (raw_samples, d))
        vals = self.ucb(cand, beta)
        top = cand[jnp.argsort(-vals)[:num_restarts]]

        x_tr, y_tr, params = self.x, self.y, self.params

        @jax.jit
        def ascend(x0):
            opt = optax.adam(5e-2)

            def obj(xx):
                mean, std = posterior(params, x_tr, y_tr, xx[None])
                return -(mean[0] + jnp.sqrt(beta) * std[0])

            def step(carry, _):
                xx, s = carry
                g = jax.grad(obj)(xx)
                updates, s = opt.update(g, s, xx)
                xx = jnp.clip(optax.apply_updates(xx, updates), lo, hi)
                return (xx, s), None

            (xx, _), _ = jax.lax.scan(step, (x0, opt.init(x0)), None,
                                      length=ascent_steps)
            return xx, -obj(xx)

        return jax.vmap(ascend)(top)

    def optimize_ucb(self, bounds: jnp.ndarray, key: jax.Array, beta: float = 0.1,
                     raw_samples: int = 200, num_restarts: int = 20,
                     ascent_steps: int = 50) -> jnp.ndarray:
        xs, vs = self._ascend_from_candidates(
            bounds, key, beta, raw_samples, num_restarts, ascent_steps
        )
        return xs[jnp.argmax(vs)]

    def optimize_ucb_batch(self, bounds: jnp.ndarray, key: jax.Array, q: int,
                           beta: float = 0.1, raw_samples: int = 200,
                           num_restarts: int = 20, ascent_steps: int = 50,
                           min_dist: float = 1e-3) -> jnp.ndarray:
        """Top-q *distinct* UCB ascent endpoints (greedy diversity filter) —
        the acquisition batch evaluated together by a vectorized sweep."""
        import numpy as np

        lo, hi = bounds[:, 0], bounds[:, 1]
        d = bounds.shape[0]
        xs, vs = self._ascend_from_candidates(
            bounds, key, beta, raw_samples, num_restarts, ascent_steps
        )
        xs_np = np.asarray(xs)
        order = np.argsort(-np.asarray(vs))
        span = np.asarray(hi - lo)
        picked = []
        for i in order:
            if all(np.linalg.norm((xs_np[i] - xs_np[j]) / span) > min_dist
                   for j in picked):
                picked.append(int(i))
            if len(picked) == q:
                break
        # fill with fresh random candidates if diversity ran dry
        while len(picked) < q:
            key, k2 = jax.random.split(key)
            extra = np.asarray(lo + (hi - lo) * jax.random.uniform(k2, (d,)))
            xs_np = np.vstack([xs_np, extra])
            picked.append(len(xs_np) - 1)
        return jnp.asarray(xs_np[picked])
