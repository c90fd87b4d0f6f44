"""PCA-subspace elliptical slice sampler.

Parity target: /root/reference/URSABench/inference/pca_subspace.py — phase 1
builds a rank-k PCA subspace of the SWA trajectory (:61-63,110-115); phase 2
runs elliptical slice sampling in subspace coordinates with log-target
-loss/temperature over the full train set (:106-108,120-123 via util.log_pdf
and util.elliptical_slice), projecting each accepted theta back to weights
(:124-128), BN refresh on the final sample (:139-140).

TPU-native: the tempered full-data log-likelihood is one jitted scan over
device-resident batches, and each ESS transition (bracket shrinking
included) is a single lax.while_loop program — the reference's hottest
Python loop (SURVEY.md §3.4) collapses into one XLA computation per draw.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..data.transforms import normalize
from ..ops.ess import elliptical_slice
from .base import _Inference
from .ensemble import Ensemble
from .subspaces import SubspaceModel
from .swa import SWA


class PCASubspaceSampler(_Inference):
    _DEFAULT_HYP = {
        "swag_lr": 0.001, "swag_wd": 0.001, "lr_init": 0.001, "num_samples": 20,
        "swag_momentum": 0.1, "swag_burn_in_epochs": 100, "num_swag_iterates": 50,
        "rank": 20, "max_rank": 20, "temperature": 5000, "prior_std": 2.0,
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
        self.rank = int(hyp["rank"])
        self.max_rank = int(hyp["max_rank"])
        self.num_samples = int(hyp["num_samples"])
        self.prior_std = float(hyp["prior_std"])
        self.temperature = float(hyp["temperature"])
        swag_hyp = {
            "burn_in_epochs": int(hyp["swag_burn_in_epochs"]),
            "momentum": float(hyp["swag_momentum"]),
            "lr_init": float(hyp["lr_init"]),
            "swag_lr": float(hyp["swag_lr"]),
            "swag_wd": float(hyp["swag_wd"]),
            "num_iterates": int(hyp["num_swag_iterates"]),
            "subspace_type": "pca",
        }
        # the SWA phase is single-trajectory: hand it the mesh for data
        # parallelism when the chain axis is trivial (ESS chains themselves
        # shard over 'chain' via _place_chains-style GSPMD)
        swa_mesh = (
            self.mesh
            if self.mesh is not None and self.mesh.shape.get("chain", 1) == 1
            else None
        )
        self.swa = SWA(
            swag_hyp, model=self.module, train=self.train, key=self.next_key(),
            max_rank=self.max_rank, pca_rank=self.rank, mesh=swa_mesh,
        )
        self.subspace_constructed = False
        self.subspace: SubspaceModel | None = None
        self.current_theta = None
        self.current_lnpdf = None
        self._lnpdf_jit = None

    def update_hyp(self, hyperparameters):
        self._setup(hyperparameters)

    # -- tempered full-data log density (util.py:260-274) ----------------------

    def _build_lnpdf(self):
        images, labels = self.train.device_arrays()
        spec = self.train.spec
        n = self.train.n
        bsz = self.train.batch_size
        module = self.module
        unravel = self.swa._unravel
        mean = self.subspace.mean
        cov_factor = self.subspace.cov_factor
        temperature = self.temperature
        bstats = self.swa._state.batch_stats
        C = self.chains

        # a mesh 'data' axis > 1 DATA-PARALLELIZES the tempered full-data
        # log-density (SURVEY §3.4 flags this loop as the hottest in the
        # system): every evaluation inside the ESS bracket while_loop is
        # computed shard-wise with one psum. ESS is gradient-free, so the
        # value-level psum is the whole story (no grad-through-psum hazard
        # — contrast hmc.py's explicit psum-of-local-grads). The bracket
        # while_loop stays lock-step across data shards because its
        # condition only reads psum'd (replicated) values and replicated
        # keys/thetas.
        data_shards = 1
        if (self.mesh is not None and "data" in self.mesh.shape
                and self.mesh.shape["data"] > 1):
            data_shards = self.mesh.shape["data"]
            assert n >= data_shards, (n, data_shards)
            bsz = max(data_shards, bsz - bsz % data_shards)
        local_bsz = bsz // data_shards
        nb = -(-n // bsz)
        pad = nb * bsz - n

        idx = jnp.arange(n)
        if pad:
            idx = jnp.concatenate([idx, jnp.full((pad,), -1)])
        batches = idx.reshape(nb, bsz)

        # dataset AND per-run subspace state (mean/cov_factor/bstats) enter
        # the jitted programs as ARGUMENTS: closure-captured arrays get baked
        # into the executable, which bloats compile-cache entries and forces
        # a recompile per trial/subspace — see engine.make_epoch_fn
        def lnpdf(theta, images, labels, mean, cov_factor, bstats):
            w = mean + cov_factor.T @ theta
            params = unravel(w)
            variables = {"params": params}
            if bstats:
                variables["batch_stats"] = bstats

            def body(total, b_idx):
                if data_shards > 1:
                    b_idx = jax.lax.dynamic_slice(
                        b_idx,
                        (jax.lax.axis_index("data") * local_bsz,),
                        (local_bsz,),
                    )
                valid = (b_idx >= 0).astype(jnp.float32)
                x = normalize(jnp.take(images, jnp.maximum(b_idx, 0), axis=0), spec)
                y = jnp.take(labels, jnp.maximum(b_idx, 0), axis=0)
                # reference log_pdf runs the net in train mode (batch-stat
                # normalization) under no_grad (util.py:266-273); we use
                # train-mode stats and discard the buffer mutations.
                logits, _ = module.apply(
                    variables, x, train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(0)},
                )
                ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
                return total + jnp.sum(ce * valid), None

            total, _ = jax.lax.scan(body, 0.0, batches)
            if data_shards > 1:
                total = jax.lax.psum(total, "data")
            return -total / temperature

        # jit the WHOLE ESS transition (bracket while_loop + every full-data
        # log-density evaluation) once — calling elliptical_slice with a
        # merely-jitted lnpdf re-traces the loop on every draw. Chains are a
        # leading axis; chain_strategy picks how they advance on one device:
        # 'vmap' batches them (the while_loop runs lock-step: all chains
        # evaluate until EVERY bracket closes, and conv log-densities lower
        # to grouped convolutions), 'scan' runs each chain's bracket loop to
        # ITS OWN trip count with unbatched convs, and 'auto' = scan iff
        # conv kernels and no chain-sharded mesh (engine.resolve_chain_strategy).
        from .engine import resolve_chain_strategy

        # mesh-aware: chain-sharded coords advance via GSPMD-partitioned
        # vmap, never a cross-chip-serializing scan (engine docstring)
        strategy = resolve_chain_strategy(
            self.chain_strategy, module, spec.shape, self.mesh
        )
        self._resolved_chain_strategy = strategy if C > 1 else None

        def transition_impl(key, theta, prior, cur, images, labels, mean,
                            cov_factor, bstats):
            f = lambda th: lnpdf(th, images, labels, mean, cov_factor, bstats)
            return elliptical_slice(key, theta, prior, f, cur_lnpdf=cur)

        data_axes = (None,) * 5

        def transition_body(keys, theta, prior, cur, images, labels, mean,
                            cov_factor, bstats):
            if strategy == "vmap" or keys.shape[0] == 1:
                return jax.vmap(
                    transition_impl, in_axes=(0, 0, 0, 0) + data_axes
                )(keys, theta, prior, cur, images, labels, mean, cov_factor,
                  bstats)

            def body(_, xs):
                k, th, pr, cu = xs
                return None, transition_impl(k, th, pr, cu, images, labels,
                                             mean, cov_factor, bstats)

            _, out = jax.lax.scan(body, None, (keys, theta, prior, cur))
            return out

        def lnpdf_body(theta, images, labels, mean, cov_factor, bstats):
            return jax.vmap(lnpdf, in_axes=(0,) + data_axes)(
                theta, images, labels, mean, cov_factor, bstats
            )

        if data_shards > 1:
            # shard_map over the full mesh: chain blocks over 'chain' (when
            # divisible; else replicated), every log-density shard-wise over
            # 'data'. Keys/thetas replicate across 'data', so each chain's
            # bracket decisions agree on every data shard.
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import replicate_to_mesh

            chain_shards = self.mesh.shape.get("chain", 1)
            c_ax = ("chain" if chain_shards > 1 and C % chain_shards == 0
                    else None)
            rep = P()
            state_specs = (P(c_ax),) * 4
            transition_jit = jax.jit(jax.shard_map(
                transition_body, mesh=self.mesh,
                in_specs=state_specs + (rep,) * 5,
                out_specs=(P(c_ax), P(c_ax)),
                check_vma=False,
            ))
            lnpdf_jit = jax.jit(jax.shard_map(
                lnpdf_body, mesh=self.mesh,
                in_specs=(P(c_ax),) + (rep,) * 5,
                out_specs=P(c_ax),
                check_vma=False,
            ))
            images, labels, mean, cov_factor = replicate_to_mesh(
                self.mesh, images, labels, mean, cov_factor
            )
        else:
            transition_jit = jax.jit(transition_body)
            lnpdf_jit = jax.jit(lnpdf_body)

        def lnpdf_fn(theta):
            return lnpdf_jit(theta, images, labels, mean, cov_factor, bstats)

        def transition(keys, theta, prior, cur):
            return transition_jit(keys, theta, prior, cur, images, labels,
                                  mean, cov_factor, bstats)

        return lnpdf_fn, transition

    # -- sampling ---------------------------------------------------------------

    def sample_iterative(self, update_bn=True, val_loader=None, debug_val_loss=False):
        """One ESS draw per chain. The subspace (phase 1) is shared across
        chains; each chain is an independent ESS stream in it (per-chain
        theta/lnpdf state and keys). chains==1 returns unstacked pytrees
        (the SGHMC convention), multi-chain returns a leading chain axis."""
        C = self.chains
        if not self.subspace_constructed:
            self.swa.sample()  # phase 1 (pca_subspace.py:111-113)
            mean, _, cov_factor = self.swa.get_space()
            self.subspace = SubspaceModel(mean, cov_factor)
            self._lnpdf_jit, self._ess_transition = self._build_lnpdf()
            self.current_theta = jnp.zeros((C, self.subspace.rank))
            self.subspace_constructed = True
        k_prior, k_ess = jax.random.split(self.next_key())
        actual_rank = self.subspace.rank
        prior_sample = self.prior_std * jax.random.normal(
            k_prior, (C, actual_rank)
        )
        theta = self.current_theta[:, :actual_rank]
        if self.current_lnpdf is None:
            self.current_lnpdf = self._lnpdf_jit(theta)
        theta, lnp = self._ess_transition(
            jax.random.split(k_ess, C), theta, prior_sample, self.current_lnpdf
        )
        self.current_theta = theta
        self.current_lnpdf = lnp
        ws = jax.vmap(self.subspace)(theta)  # (C, P)
        base_bstats = self.swa._state.batch_stats

        def member(c):
            params = self.swa._unravel(ws[c])
            if update_bn and base_bstats:
                bstats = self.swa._bn_refresh(params, base_bstats)
            else:
                bstats = jax.tree.map(lambda x: x.copy(), base_bstats)
            return params, bstats

        members = [member(c) for c in range(C)]
        if C == 1:
            return members[0]
        from ..util import tree_stack

        return (tree_stack([m[0] for m in members]),
                tree_stack([m[1] for m in members]))

    # -- mid-chain checkpointing ------------------------------------------------

    def enable_auto_checkpoint(self, path: str, every_epochs: int = 10,
                               resume: bool = True) -> bool:
        """ESS variant of the elastic-recovery hook: ``every_epochs``
        counts DRAWS. The checkpoint persists the SUBSPACE (mean,
        cov_factor, trained batch stats — the expensive SWA phase) plus the
        ESS state (current theta/lnpdf, PRNG key) and the per-draw
        subspace coordinates; draws reproject losslessly on resume, so the
        file stays rank-sized instead of num_draws x P."""
        import os

        self._ckpt_path = path
        self._ckpt_every = max(1, int(every_epochs))
        self._resume_state = None
        if resume and os.path.exists(path):
            from ..utils_checkpoint import load_pytree

            self._resume_state = load_pytree(path)
            return True
        return False

    def _save_chain(self, draw_thetas):
        path = getattr(self, "_ckpt_path", None)
        if path is None or len(draw_thetas) % self._ckpt_every != 0:
            return
        from ..utils_checkpoint import save_pytree

        save_pytree(path, {
            "mean": self.subspace.mean,
            "cov_factor": self.subspace.cov_factor,
            "batch_stats": self.swa._state.batch_stats,
            "theta": self.current_theta,
            "lnpdf": self.current_lnpdf,
            "key": self.key,
            "draw_thetas": jnp.stack(draw_thetas),
        })

    def _restore_chain(self):
        """Rebuild phase-1 products + ESS state from a checkpoint; returns
        the per-draw subspace coordinates already drawn."""
        r = self._resume_state
        self._resume_state = None
        self.subspace = SubspaceModel(
            jnp.asarray(r["mean"]), jnp.asarray(r["cov_factor"])
        )
        if r.get("batch_stats"):
            self.swa._state = self.swa._state._replace(
                batch_stats=r["batch_stats"]
            )
        self._lnpdf_jit, self._ess_transition = self._build_lnpdf()
        self.current_theta = jnp.asarray(r["theta"])
        self.current_lnpdf = jnp.asarray(r["lnpdf"])
        self.key = jnp.asarray(r["key"])
        self.subspace_constructed = True
        return [t for t in jnp.asarray(r["draw_thetas"])]

    def _project_draw(self, theta, update_bn):
        """Subspace coordinates -> per-chain (params, bstats) members."""
        C = self.chains
        ws = jax.vmap(self.subspace)(theta)
        base_bstats = self.swa._state.batch_stats

        def member(c):
            params = self.swa._unravel(ws[c])
            if update_bn and base_bstats:
                bstats = self.swa._bn_refresh(params, base_bstats)
            else:
                bstats = jax.tree.map(lambda x: x.copy(), base_bstats)
            return params, bstats

        members = [member(c) for c in range(C)]
        if C == 1:
            return members[0]
        from ..util import tree_stack

        return (tree_stack([m[0] for m in members]),
                tree_stack([m[1] for m in members]))

    def sample(self, num_samples=None, val_loader=None, debug_val_loss=False) -> Ensemble:
        from .sgmcmc import SGHMC

        if num_samples is None:
            num_samples = self.num_samples
        resumed = getattr(self, "_resume_state", None)
        if resumed is not None and resumed["draw_thetas"].shape[0] <= num_samples:
            draw_thetas = self._restore_chain()
        else:
            draw_thetas = []
        # the final draw carries the BN refresh (pca_subspace.py:139-140),
        # including when the checkpoint already holds all draws
        draws = [
            self._project_draw(
                t, update_bn=(len(draw_thetas) == num_samples
                              and i == num_samples - 1)
            )
            for i, t in enumerate(draw_thetas)
        ]
        while len(draws) < num_samples:
            last = len(draws) == num_samples - 1
            draws.append(self.sample_iterative(update_bn=last))
            draw_thetas.append(self.current_theta)
            self._save_chain(draw_thetas)
        return SGHMC._ensemble_from_draws(self, draws)
