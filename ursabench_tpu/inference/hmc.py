"""Full-batch Hamiltonian Monte Carlo — in-house leapfrog + MH accept.

Parity target: /root/reference/URSABench/inference/hmc.py, which delegates
to the external hamiltorch package (hmc.py:71-75) with per-parameter prior
precision tau, output precision tau_out=1, leapfrog params (step_size, L),
diagonal inverse mass, and thinning ``samples[burn*L::L]`` over the stored
trajectory (hmc.py:80) — equivalent to keeping ``chain[burn:]`` of the
per-draw chain including the initial point (negative burn keeps the last
``-burn`` draws, the time_script.py:83 burn=-1 protocol).

TPU-native: the ENTIRE chain is one jitted program — lax.scan over draws,
lax.scan over the L leapfrog steps inside, and the full-batch gradient as a
scan over device-resident data. log-target:
    log p(theta) = -tau_out * CE_sum(data; theta) - 0.5 * tau * ||theta||^2
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..data.transforms import normalize
from ..util import ravel, tree_stack, unraveler
from .base import _Inference
from .ensemble import Ensemble


class HMC(_Inference):
    _DEFAULT_HYP = {
        "step_size": 0.001, "num_samples": 10, "L": 1, "tau": 0.1,
        "burn": -1, "mass": 1.0,
    }

    def __init__(self, hyperparameters, model=None, train=None,
                 model_loss="multi_class_linear_output", key=None, chains=1):
        super().__init__(hyperparameters, model, train, model_loss, key, chains)
        if hyperparameters is None:
            hyperparameters = dict(self._DEFAULT_HYP)
        self._setup(hyperparameters)

    def _setup(self, hyp):
        self.hyperparameters = hyp
        self.step_size = float(hyp["step_size"])
        self.num_samples = int(hyp["num_samples"])
        self.L = int(hyp["L"])
        self.tau = float(hyp["tau"])
        self.burn = int(hyp["burn"])
        self.mass = float(hyp["mass"])
        variables = self.fresh_variables()
        self._params0 = variables["params"]
        self._bstats = variables.get("batch_stats", {})
        self._unravel = unraveler(self._params0)
        self._theta0 = ravel(self._params0)
        self._chain_fn = None

    def update_hyp(self, hyp):
        self._setup(hyp)

    def _build_chain_fn(self):
        images, labels = self.train.device_arrays()
        spec = self.train.spec
        n = self.train.n
        # the full-batch potential doesn't need the loader's minibatch size;
        # scan in large chunks to amortize per-step overhead ('grad_batch'
        # hyper overrides, default 4096)
        bsz = min(n, int(self.hyperparameters.get("grad_batch", 4096)))
        nb = -(-n // bsz)
        pad = nb * bsz - n
        module = self.module
        unravel = self._unravel
        bstats = self._bstats
        tau, tau_out = self.tau, 1.0
        inv_mass = 1.0 / self.mass
        eps, L, num_samples = self.step_size, self.L, self.num_samples

        idx = jnp.arange(n)
        if pad:
            idx = jnp.concatenate([idx, jnp.full((pad,), -1)])
        batches = idx.reshape(nb, bsz)

        def neg_log_post(theta):
            params = unravel(theta)
            variables = {"params": params}
            if bstats:
                variables["batch_stats"] = bstats

            def body(total, b_idx):
                valid = (b_idx >= 0).astype(jnp.float32)
                x = normalize(jnp.take(images, jnp.maximum(b_idx, 0), axis=0), spec)
                y = jnp.take(labels, jnp.maximum(b_idx, 0), axis=0)
                logits = module.apply(
                    variables, x, train=False,
                    rngs={"dropout": jax.random.PRNGKey(0)},
                )
                ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
                return total + jnp.sum(ce * valid), None

            ll_sum, _ = jax.lax.scan(body, 0.0, batches)
            return tau_out * ll_sum + 0.5 * tau * jnp.sum(theta ** 2)

        grad_u = jax.grad(neg_log_post)

        del num_samples

        @jax.jit
        def draw(theta, u_cur, key):
            """One HMC transition, compiled once and dispatched per draw —
            avoids the deeply nested scan-of-scan-of-scan compile cost."""
            k_mom, k_acc = jax.random.split(key)
            # momentum ~ N(0, M) with M = mass * I; kinetic = 0.5 p^T M^-1 p
            p0 = jax.random.normal(k_mom, theta.shape) * jnp.sqrt(self.mass)

            # standard half-step leapfrog: one gradient per step (the naive
            # two-half-steps-per-step form costs 2x the full-data grads)
            p_half = p0 - 0.5 * eps * grad_u(theta)

            def leapfrog(c, _):
                th, p, _ = c
                th = th + eps * inv_mass * p
                g = grad_u(th)
                return (th, p - eps * g, g), None

            (theta_new, p_over, g_last), _ = jax.lax.scan(
                leapfrog, (theta, p_half, jnp.zeros_like(theta)), None, length=L
            )
            # the scan subtracted a full eps*g on the last step; roll back half
            p_new = p_over + 0.5 * eps * g_last
            u_new = neg_log_post(theta_new)
            h_cur = u_cur + 0.5 * inv_mass * jnp.sum(p0 ** 2)
            h_new = u_new + 0.5 * inv_mass * jnp.sum(p_new ** 2)
            accept = jnp.log(jax.random.uniform(k_acc)) < (h_cur - h_new)
            theta = jnp.where(accept, theta_new, theta)
            u_cur = jnp.where(accept, u_new, u_cur)
            return theta, u_cur, accept

        neg_log_post_jit = jax.jit(neg_log_post)

        def chain(theta0, key, n_draws):
            u = neg_log_post_jit(theta0)
            theta = theta0
            thetas, accepts = [theta0], []
            for k in jax.random.split(key, n_draws):
                theta, u, acc = draw(theta, u, k)
                thetas.append(theta)
                accepts.append(acc)
            return jnp.stack(thetas), jnp.stack(accepts)

        return chain

    def sample(self, num_samples=None, debug=False) -> Ensemble:
        if self._chain_fn is None:
            self._chain_fn = self._build_chain_fn()
        if num_samples is None:
            num_samples = self.num_samples
        chain, accepts = self._chain_fn(self._theta0, self.next_key(), num_samples)
        if debug:
            print("HMC acceptance rate:", float(jnp.mean(accepts)))
        self.accept_rate = float(jnp.mean(accepts))
        kept = chain[self.burn:]  # python slice semantics incl. negative burn
        params = tree_stack([self._unravel(kept[i]) for i in range(kept.shape[0])])
        bstats = None
        if self._bstats:
            bstats = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (kept.shape[0],) + x.shape),
                self._bstats,
            )
        return Ensemble(self.module, params, bstats, int(kept.shape[0]))
