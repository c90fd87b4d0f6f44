"""Vectorized multi-config sweeps for the epoch-driven samplers.

The reference parallelizes hyperparameter sweeps by launching one OS
process per configuration (run_par_hypOpt.py:78-79 + subprocess command
lists, method-agnostic via hyper_optimization.py:171-201). On TPU the
right construct is config-as-a-batch-axis: K configurations' sampler
states advance in ONE device program — the shared epoch body
(engine.make_epoch_fn with ``vmap_hyp=True``) is vmapped over
(state, hyp) so XLA batches the K model updates onto the same kernels
(SURVEY.md §2.9 "config parallelism"; BASELINE.md config 5).

``MethodSweep`` is parameterized over the inference method exactly the way
``make_epoch_fn`` is — each sampler class carries its (``_LR_FN``,
``_UPDATE_FN``) traced-hyp contract, and the sweep reuses the class's own
``_hyp_scalars`` construction and harvest protocol, so SGHMC / SGLD /
cSGHMC / cSGLD / SGD all sweep through the same machinery. Constraints:
all configs share the schedule-shape integers (burn_in/num_samples,
cycle structure) and the architecture; continuous hypers (lr, prior_std,
alpha, momentum, weight_decay) vary freely per config.
"""

from __future__ import annotations

from typing import List, Sequence

import jax

from ..util import tree_stack
from .engine import make_epoch_fn
from .ensemble import Ensemble

# method name -> sampler class (resolved lazily to avoid import cycles)
_METHODS = ("SGHMC", "SGLD", "cSGHMC", "cSGLD", "SGD")


def _method_class(name: str):
    from . import sgd_map, sgmcmc

    try:
        return {
            "SGHMC": sgmcmc.SGHMC, "SGLD": sgmcmc.SGLD,
            "cSGHMC": sgmcmc.cSGHMC, "cSGLD": sgmcmc.cSGLD,
            "SGD": sgd_map.SGD,
        }[name]
    except KeyError:
        raise ValueError(
            f"unknown sweep method {name!r}; supported: {_METHODS}"
        ) from None


# schedule-shape fields that must agree across configs per method (the
# compiled program's trip counts / harvest points depend on them)
_SHARED_FIELDS = {
    "SGHMC": ("num_samples", "burn_in_epochs"),
    "SGLD": ("num_samples", "burn_in_epochs"),
    "cSGHMC": ("num_samples_per_cycle", "cycle_length", "burn_in_epochs",
               "num_cycles"),
    "cSGLD": ("num_samples_per_cycle", "cycle_length", "burn_in_epochs",
              "num_cycles"),
    "SGD": ("burn_in_epochs",),
}


class MethodSweep:
    """K configurations of one epoch-driven sampler advance simultaneously.

    Per-config sampler instances supply the exact per-method state init and
    traced-hyp scalars (identical to running each config alone with the
    same per-config key); the sweep stacks them on a leading K axis and
    drives config 0's protocol (noise gates / harvest schedule — shared by
    construction) against one ``vmap_hyp`` epoch program.
    """

    def __init__(self, hyp_list: Sequence[dict], model=None, train=None,
                 key=None, method: str = "SGHMC",
                 eta_min_fraction: float = 0.0, chain_strategy: str = "auto",
                 mesh=None):
        assert len(hyp_list) >= 1
        del eta_min_fraction  # ctor semantics == each sampler's ctor (0.0)
        self.module = model
        self.train = train
        self.method = method
        self.hyp_list = list(hyp_list)
        self.K = len(hyp_list)
        cls = _method_class(method)
        key = key if key is not None else jax.random.PRNGKey(0)
        keys = jax.random.split(key, self.K)
        # per-config samplers: canonical _hyp_scalars + state init per
        # method (their lazily-jitted single-config epoch fns never compile)
        self._samplers = [
            cls(dict(h), model=model, train=train, key=keys[i])
            for i, h in enumerate(hyp_list)
        ]
        proto = self._samplers[0]
        for s in self._samplers[1:]:
            for f in _SHARED_FIELDS[method]:
                assert getattr(s, f) == getattr(proto, f), (
                    f"sweep configs must share {f!r}: "
                    f"{getattr(s, f)} != {getattr(proto, f)}"
                )
        self._proto = proto
        self._state = tree_stack([s._state for s in self._samplers])
        self._hyp_vec = tree_stack(
            [s._hyp_scalars for s in self._samplers]
        )
        if mesh is not None:
            # configs ride the mesh's 'chain' axis (SURVEY §2.9 config
            # parallelism: K configs train chip-parallel, each config's
            # batch data-sharded over 'data'). State AND the hyp vector
            # shard over 'chain' — the epoch program's in_specs match.
            from jax.sharding import NamedSharding, PartitionSpec as P

            assert self.K % mesh.shape["chain"] == 0, (
                self.K, dict(mesh.shape))
            sharding = NamedSharding(mesh, P("chain"))
            put = lambda t: jax.tree.map(
                lambda x: jax.device_put(x, sharding), t)
            self._state = put(self._state)
            self._hyp_vec = put(self._hyp_vec)
        for s in self._samplers:  # K per-config param copies now live in
            s._state = None       # the stacked state; drop the originals
        self._epoch_fn = make_epoch_fn(
            self.module, self.train, lr_fn=cls._LR_FN,
            update_fn=cls._UPDATE_FN, chains=self.K, vmap_hyp=True,
            chain_strategy=chain_strategy, mesh=mesh,
        )
        self.epochs_run = 0

    # -- epoch driving (config 0's protocol; schedules agree by ctor) ------

    def _run_epoch(self, noise_on: float = 1.0):
        import jax.numpy as jnp

        self._state, loss = self._epoch_fn(
            self._state, jnp.asarray(self.epochs_run, jnp.float32),
            jnp.asarray(noise_on, jnp.float32), self._hyp_vec,
        )
        self.epochs_run += 1
        self._proto.epochs_run = self.epochs_run  # drive protocol probes
        return loss

    def _harvest(self):
        copy = lambda t: jax.tree.map(lambda x: x.copy(), t)
        return copy(self._state.params), copy(self._state.batch_stats)

    def sample(self) -> List[Ensemble]:
        """Runs the full per-method protocol for every config at once
        (mirroring each method's own sample_iterative); returns a
        per-config list of Ensembles."""
        draws = []
        m, proto = self.method, self._proto
        if m in ("SGHMC", "SGLD"):  # burn+1 then 1/draw, noise always on
            for s in range(proto.num_samples):
                for _ in range(proto.burn_in_epochs + 1 if s == 0 else 1):
                    self._run_epoch(noise_on=1.0)
                draws.append(self._harvest())
        elif m == "SGD":  # single MAP draw, no Langevin noise
            for _ in range(proto.burn_in_epochs + 1):
                self._run_epoch(noise_on=0.0)
            draws.append(self._harvest())
        else:  # cSGHMC/cSGLD: cycle-tail noise gate + harvest schedule,
            # probed on config 0's counters (shared schedule by ctor)
            total = proto.num_samples_per_cycle * proto.num_cycles
            while len(draws) < total:
                noise = 1.0 if proto._noise_on() else 0.0
                self._run_epoch(noise_on=noise)
                if proto._harvested():
                    draws.append(self._harvest())
        params = tree_stack([d[0] for d in draws])  # (S, K, ...)
        bstats = tree_stack([d[1] for d in draws])
        has_bn = bool(jax.tree.leaves(bstats))
        S = len(draws)
        out = []
        for k in range(self.K):
            pk = jax.tree.map(lambda x: x[:, k], params)
            bk = jax.tree.map(lambda x: x[:, k], bstats) if has_bn else None
            out.append(Ensemble(self.module, pk, bk, S))
        return out

    def objectives(self, task_factory) -> List[float]:
        """Evaluate every config's ensemble; task_factory() builds a fresh
        single-metric task (output_performance mode)."""
        ensembles = self.sample()
        objs = []
        for ens in ensembles:
            task = task_factory()
            task.reset()
            objs.append(task.update_statistics(ens, output_performance=True))
        return objs


class SGHMCSweep(MethodSweep):
    """Back-compat alias: MethodSweep(method='SGHMC'). SGLD sweep = alpha
    1.0 in every config (or method='SGLD')."""

    def __init__(self, hyp_list: Sequence[dict], model=None, train=None,
                 key=None, eta_min_fraction: float = 0.0):
        super().__init__(hyp_list, model=model, train=train, key=key,
                         method="SGHMC", eta_min_fraction=eta_min_fraction)
