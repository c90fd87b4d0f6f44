"""Full-batch Hamiltonian Monte Carlo — in-house leapfrog + MH accept.

Parity target: /root/reference/URSABench/inference/hmc.py, which delegates
to the external hamiltorch package (hmc.py:71-75) with per-parameter prior
precision tau, output precision tau_out=1, leapfrog params (step_size, L),
diagonal inverse mass, and thinning ``samples[burn*L::L]`` over the stored
trajectory (hmc.py:80) — equivalent to keeping ``chain[burn:]`` of the
per-draw chain including the initial point (negative burn keeps the last
``-burn`` draws, the time_script.py:83 burn=-1 protocol).

TPU-native: draws advance as a jitted lax.scan over chunks of transitions
(hyp 'draw_chunk', default 10 — one dispatch per chunk instead of one
Python round-trip per draw), the L leapfrog steps are an inner scan, and
the full-batch gradient is a scan over device-resident data. Multiple
chains (the reference is single-chain, hmc.py:71) advance under one vmap
with per-chain PRNG streams and, when a mesh is given, shard over its
'chain' axis. A mesh with a 'data' axis >1 additionally DATA-PARALLELIZES
the full-batch potential: every gradient batch is computed shard-wise with
one psum per evaluation (the full-batch gradient is the most
data-parallel-friendly computation in the zoo; the reference has no
distributed HMC at all). log-target:
    log p(theta) = -tau_out * CE_sum(data; theta) - 0.5 * tau * ||theta||^2

Numerics: TPUs have no native f64, so instead of hamiltorch's
torch-float64 energies (reference hmc.py:71-75) the MH log-ratio is
computed entirely in DIFFERENCES — the prior and kinetic terms as
``sum((a-b)*(a+b))`` (every summand scales with the leapfrog MOVE, not the
absolute energy, so f32 keeps full precision at any parameter count) and
the carried data term is the CE sum alone (magnitude ~n*log(C), f32-safe).
A naive f32 ``H_cur - H_new`` is rounding noise once ``0.5*tau*||theta||^2``
crosses ~2**24 (~2e5 dims at unit scale); the difference form removes that
bound (tests/test_mcmc_correctness.py::test_hmc_large_model_energy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..data.transforms import normalize
from ..util import ravel, tree_stack, unraveler
from .base import _Inference
from .ensemble import Ensemble


def _sq_diff_sum(a, b):
    """``sum(a**2) - sum(b**2)`` computed as ``sum((a-b)*(a+b))``: each
    summand is scaled by the move ``a-b`` (Sterbenz-exact for the small
    leapfrog steps), so the result is conditioned on the ENERGY DIFFERENCE
    rather than the absolute energy — f32-safe at 36M+ params where the
    naive form loses every significant bit."""
    return jnp.sum((a - b) * (a + b))


class HMC(_Inference):
    _DEFAULT_HYP = {
        "step_size": 0.001, "num_samples": 10, "L": 1, "tau": 0.1,
        "burn": -1, "mass": 1.0,
    }

    def __init__(self, hyperparameters, model=None, train=None,
                 model_loss="multi_class_linear_output", key=None, chains=1,
                 mesh=None, chain_strategy="auto"):
        super().__init__(hyperparameters, model, train, model_loss, key,
                         chains, mesh, chain_strategy)
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
        self.draw_chunk = int(hyp.get("draw_chunk", 10))
        variables = self.fresh_variables()
        self._params0 = variables["params"]
        self._bstats = variables.get("batch_stats", {})
        self._unravel = unraveler(self._params0)
        theta0 = ravel(self._params0)
        if self.chains > 1:
            # independent per-chain inits (chain 0 keeps the ctor's init)
            extra = [
                ravel(self.fresh_variables()["params"])
                for _ in range(self.chains - 1)
            ]
            theta0 = jnp.stack([theta0] + extra)
        else:
            theta0 = theta0[None]
        self._theta0 = self._place_chains(theta0)
        self._chunk_fn = None

    def _place_chains(self, arr):
        """Shard a chains-leading array over the mesh 'chain' axis (GSPMD
        partitions every jitted chain program with no code changes)."""
        if self.mesh is None or self.chains <= 1:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(arr, NamedSharding(self.mesh, P("chain")))

    def update_hyp(self, hyp):
        self._setup(hyp)

    def _build_fns(self):
        images, labels = self.train.device_arrays()
        spec = self.train.spec
        n = self.train.n
        # the full-batch potential doesn't need the loader's minibatch size;
        # scan in large chunks to amortize per-step overhead ('grad_batch'
        # hyper overrides, default 4096)
        bsz = min(n, int(self.hyperparameters.get("grad_batch", 4096)))
        # the full-batch gradient is THE data-parallel-friendly computation:
        # with a mesh whose 'data' axis is >1 every grad batch is computed
        # shard-wise (each device takes its slice of each batch) and the CE
        # sum arrives through one psum per potential evaluation
        data_shards = 1
        if (self.mesh is not None and "data" in self.mesh.shape
                and self.mesh.shape["data"] > 1):
            data_shards = self.mesh.shape["data"]
            assert n >= data_shards, (n, data_shards)
            bsz = max(data_shards, bsz - bsz % data_shards)
        local_bsz = bsz // data_shards
        nb = -(-n // bsz)
        pad = nb * bsz - n
        module = self.module
        unravel = self._unravel
        bstats = self._bstats
        tau, tau_out = self.tau, 1.0
        inv_mass = 1.0 / self.mass
        eps, L = self.step_size, self.L

        idx = jnp.arange(n)
        if pad:
            idx = jnp.concatenate([idx, jnp.full((pad,), -1)])
        batches = idx.reshape(nb, bsz)

        # data enters the jitted programs as ARGUMENTS (closure-captured
        # datasets get baked into the executable: huge compile-cache entries
        # + a recompile whenever data changes — see engine.make_epoch_fn)
        def local_nll(theta, images, labels):
            """Shard-LOCAL CE sum (no collective). Kept separate from
            neg_log_post so the data-parallel gradient can be formed as
            psum(grad(local)) — differentiating *through* the psum inside
            shard_map(check_vma=False) silently yields data_shards x the
            local-shard gradient per device, so each shard would leapfrog
            a different trajectory."""
            params = unravel(theta)
            variables = {"params": params}
            if bstats:
                variables["batch_stats"] = bstats

            def body(carry, b_idx):
                total, comp = carry
                if data_shards > 1:
                    b_idx = jax.lax.dynamic_slice(
                        b_idx,
                        (jax.lax.axis_index("data") * local_bsz,),
                        (local_bsz,),
                    )
                valid = (b_idx >= 0).astype(jnp.float32)
                x = normalize(jnp.take(images, jnp.maximum(b_idx, 0), axis=0), spec)
                y = jnp.take(labels, jnp.maximum(b_idx, 0), axis=0)
                logits = module.apply(
                    variables, x, train=False,
                    rngs={"dropout": jax.random.PRNGKey(0)},
                )
                ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
                # Kahan accumulation: the CE sum is carried across draws as
                # the MH data term, so keep its low-order bits across batches
                val = jnp.sum(ce * valid) - comp
                t = total + val
                return (t, (t - total) - val), None

            (ll_sum, _), _ = jax.lax.scan(body, (0.0, 0.0), batches)
            return ll_sum

        def global_nll(theta, images, labels):
            ll_sum = local_nll(theta, images, labels)
            if data_shards > 1:
                ll_sum = jax.lax.psum(ll_sum, "data")
            return ll_sum

        def neg_log_post(theta, images, labels):
            # gradient-path potential only; MH accept never evaluates this
            # (the absolute 0.5*tau*||theta||^2 term is what overflows f32
            # significance at large P — see the module docstring)
            return (tau_out * global_nll(theta, images, labels)
                    + 0.5 * tau * jnp.sum(theta ** 2))

        if data_shards > 1:
            # the gradient analogue of engine._make_sharded_epoch_fn:
            # differentiate the LOCAL likelihood only, all-reduce the shard
            # gradients explicitly, then add the (replicated) prior term —
            # every device sees the identical global full-batch gradient
            _grad_local = jax.grad(local_nll)

            def grad_u(theta, images, labels):
                g = jax.lax.psum(_grad_local(theta, images, labels), "data")
                return tau_out * g + tau * theta
        else:
            grad_u = jax.grad(neg_log_post)

        def draw(theta, ll_cur, key, images, labels):
            """One HMC transition for one chain. Carries the CE sum
            (``ll_cur``), not the full potential: the MH log-ratio is formed
            purely from differences so f32 keeps full precision at any
            parameter count (module docstring)."""
            k_mom, k_acc = jax.random.split(key)
            # momentum ~ N(0, M) with M = mass * I; kinetic = 0.5 p^T M^-1 p
            p0 = jax.random.normal(k_mom, theta.shape) * jnp.sqrt(self.mass)

            # standard half-step leapfrog: one gradient per step (the naive
            # two-half-steps-per-step form costs 2x the full-data grads)
            p_half = p0 - 0.5 * eps * grad_u(theta, images, labels)

            def leapfrog(c, _):
                th, p, _ = c
                th = th + eps * inv_mass * p
                g = grad_u(th, images, labels)
                return (th, p - eps * g, g), None

            (theta_new, p_over, g_last), _ = jax.lax.scan(
                leapfrog, (theta, p_half, jnp.zeros_like(theta)), None, length=L
            )
            # the scan subtracted a full eps*g on the last step; roll back half
            p_new = p_over + 0.5 * eps * g_last
            ll_new = global_nll(theta_new, images, labels)
            # log alpha = H_cur - H_new, every term a difference:
            #   data:    tau_out * (ll_cur - ll_new)         (~n*log(C) scale)
            #   prior:   -0.5*tau     * (sum th_new^2 - sum th^2)
            #   kinetic: -0.5*M^-1    * (sum p_new^2  - sum p0^2)
            log_ratio = (tau_out * (ll_cur - ll_new)
                         - 0.5 * tau * _sq_diff_sum(theta_new, theta)
                         - 0.5 * inv_mass * _sq_diff_sum(p_new, p0))
            accept = jnp.log(jax.random.uniform(k_acc)) < log_ratio
            theta = jnp.where(accept, theta_new, theta)
            ll_cur = jnp.where(accept, ll_new, ll_cur)
            return theta, ll_cur, accept

        # chains advance per draw by chain_strategy: 'vmap' batches the
        # leapfrog across chains (conv models lower to grouped
        # convolutions — the pathology engine.make_epoch_fn's chain-axis
        # rule avoids), 'scan' runs each chain's trajectory with unbatched
        # convs, 'auto' = scan iff conv kernels AND no chain-sharded mesh.
        from .engine import resolve_chain_strategy

        # mesh-aware: chain-sharded theta (self._place_chains) must advance
        # via GSPMD-partitioned vmap, never a cross-chip-serializing scan
        strategy = resolve_chain_strategy(
            self.chain_strategy, module, spec.shape, self.mesh
        )
        self._resolved_chain_strategy = strategy if self.chains > 1 else None

        def chains_draw(th, uu, ks, images, labels):
            if strategy == "vmap" or th.shape[0] == 1:
                return jax.vmap(draw, in_axes=(0, 0, 0, None, None))(
                    th, uu, ks, images, labels
                )

            def body(_, xs):
                t, u_, k = xs
                return None, draw(t, u_, k, images, labels)

            _, out = jax.lax.scan(body, None, (th, uu, ks))
            return out

        def chunk_body(theta, u, keys, images, labels):
            """A lax.scan over draw transitions, all chains advanced per
            chain_strategy: theta (C, P), u = per-chain CE sums (C,),
            keys (k, C, 2) -> trajectory (k, C, P)."""

            def body(carry, ks):
                th, uu = carry
                th, uu, acc = chains_draw(th, uu, ks, images, labels)
                return (th, uu), (th, uu, acc)

            _, (thetas, us, accepts) = jax.lax.scan(body, (theta, u), keys)
            return thetas, us, accepts

        def nlp_body(theta, images, labels):
            # per-chain CE sums (the carried MH data term — NOT the full
            # potential; the prior enters the accept only as a difference)
            return jax.vmap(global_nll, in_axes=(0, None, None))(
                theta, images, labels
            )

        if data_shards > 1:
            # shard_map over the full mesh: chains block over 'chain' (when
            # divisible; else replicated), every potential/gradient shard-wise
            # over 'data' with the psum above. Per-chain keys are replicated
            # across 'data', so MH accept decisions agree on every data shard.
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import replicate_to_mesh

            chain_shards = self.mesh.shape.get("chain", 1)
            c_ax = ("chain" if chain_shards > 1
                    and self.chains % chain_shards == 0 else None)
            chunk_impl = jax.jit(jax.shard_map(
                chunk_body, mesh=self.mesh,
                in_specs=(P(c_ax), P(c_ax), P(None, c_ax), P(), P()),
                out_specs=(P(None, c_ax), P(None, c_ax), P(None, c_ax)),
                check_vma=False,
            ))
            nlp_impl = jax.jit(jax.shard_map(
                nlp_body, mesh=self.mesh,
                in_specs=(P(c_ax), P(), P()), out_specs=P(c_ax),
                check_vma=False,
            ))
            images, labels = replicate_to_mesh(self.mesh, images, labels)
        else:
            chunk_impl = jax.jit(chunk_body)
            nlp_impl = jax.jit(nlp_body)

        def nlp(theta):
            return nlp_impl(theta, images, labels)

        def chunk(theta, u, keys):
            return chunk_impl(theta, u, keys, images, labels)

        return nlp, chunk

    # -- mid-chain checkpointing ------------------------------------------------

    def enable_auto_checkpoint(self, path: str, every_epochs: int = 10,
                               resume: bool = True) -> bool:
        """HMC variant of the elastic-recovery hook: ``every_epochs`` counts
        DRAWS (HMC has no epochs). The checkpoint persists (theta, u, the
        outer PRNG key, the kept trajectory, accepts, draws_done) so a
        killed chain resumes mid-trajectory inside ``sample()``."""
        import os

        self._ckpt_path = path
        self._ckpt_every = max(1, int(every_epochs))
        self._resume_state = None
        if resume and os.path.exists(path):
            from ..utils_checkpoint import load_pytree

            self._resume_state = load_pytree(path)
            return True
        return False

    def _save_chain(self, theta, u, key, trajectory, accepts, done):
        path = getattr(self, "_ckpt_path", None)
        if path is None or done % self._ckpt_every != 0:
            return
        from ..utils_checkpoint import save_pytree

        save_pytree(path, {
            # "u" is the carried CE sum since r4 ("ll_format" marks it; a
            # pre-r4 checkpoint stored the full potential there instead)
            "theta": theta, "u": u, "ll_format": jnp.asarray(True),
            "key": key,
            "trajectory": jnp.concatenate(
                [trajectory[0][None]] + trajectory[1:], axis=0
            ),
            "accepts": (jnp.concatenate(accepts, axis=0) if accepts
                        else jnp.zeros((0, self.chains), bool)),
            "draws_done": jnp.asarray(done),
        })

    def sample(self, num_samples=None, debug=False) -> Ensemble:
        if self._chunk_fn is None:
            self._nlp_fn, self._chunk_fn = self._build_fns()
        if num_samples is None:
            num_samples = self.num_samples
        C = self.chains
        resumed = getattr(self, "_resume_state", None)
        if resumed is not None and int(resumed["draws_done"]) <= num_samples:
            theta = self._place_chains(resumed["theta"])
            if resumed.get("ll_format") is not None:
                u = self._place_chains(resumed["u"])  # carried CE sum
            else:
                # pre-r4 checkpoint stored the full potential: recompute
                # the CE-sum carry from theta (deterministic eval)
                u = self._nlp_fn(theta)
            key = resumed["key"]
            traj0 = jnp.asarray(resumed["trajectory"])
            trajectory = [traj0[0], traj0[1:]] if traj0.shape[0] > 1 else [traj0[0]]
            accepts = ([jnp.asarray(resumed["accepts"])]
                       if resumed["accepts"].shape[0] else [])
            done = int(resumed["draws_done"])
            self._resume_state = None
        else:
            theta = self._theta0
            u = self._nlp_fn(theta)
            trajectory = [theta]
            accepts = []
            done = 0
            key = self.next_key()
        left = num_samples - done
        # one compiled chunk shape for the whole chain: a final partial chunk
        # is padded to chunk_size and the surplus draws discarded (a shape
        # change would force a second full remote compile of the program)
        chunk_size = min(self.draw_chunk, num_samples)
        while left > 0:
            k = min(chunk_size, left)
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, chunk_size * C).reshape(chunk_size, C, 2)
            thetas, us, accs = self._chunk_fn(theta, u, keys)
            theta, u = thetas[k - 1], us[k - 1]
            trajectory.append(thetas[:k])
            accepts.append(accs[:k])
            left -= k
            done += k
            self._save_chain(theta, u, key, trajectory, accepts, done)
        chain = jnp.concatenate(
            [trajectory[0][None]] + trajectory[1:], axis=0
        )  # (1 + num_samples, C, P)
        accepts = jnp.concatenate(accepts, axis=0)
        self.accept_rate = float(jnp.mean(accepts))
        if debug:
            print("HMC acceptance rate:", self.accept_rate)
        kept = chain[self.burn:]  # python slice semantics incl. negative burn
        n_kept = int(kept.shape[0])
        flat = kept.reshape(n_kept * C, -1)  # draw-major, chains within draw
        params = tree_stack([self._unravel(flat[i]) for i in range(flat.shape[0])])
        bstats = None
        if self._bstats:
            bstats = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (flat.shape[0],) + x.shape),
                self._bstats,
            )
        return Ensemble(self.module, params, bstats, int(flat.shape[0]))
