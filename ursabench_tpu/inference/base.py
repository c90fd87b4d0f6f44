"""Sampler protocol — parity with the reference ``_Inference`` contract
(/root/reference/URSABench/inference/inference_base.py:12-56): ctor takes
(hyperparameters, model, train data); ``update_hyp`` re-initializes,
``sample_iterative`` yields one posterior sample per call, ``sample``
returns the full ensemble. The TPU edition returns stacked-pytree
``Ensemble`` objects instead of ``List[nn.Module]``.
"""

from __future__ import annotations

from typing import Optional

import jax

from ..data.arrays import DataSplit
from .engine import init_variables, make_eval_loss_fn
from .ensemble import Ensemble


class _Inference:
    def __init__(
        self,
        hyperparameters: Optional[dict],
        model=None,  # flax module
        train: Optional[DataSplit] = None,
        model_loss: str = "multi_class_linear_output",
        key: Optional[jax.Array] = None,
        chains: int = 1,
        mesh=None,
        chain_strategy: str = "auto",
    ):
        if model_loss != "multi_class_linear_output":
            raise NotImplementedError(model_loss)
        self.module = model
        self.train = train
        self.model_loss = model_loss
        self.key = key if key is not None else jax.random.PRNGKey(0)
        self.chains = int(chains)
        self.mesh = mesh  # ('chain', ...) mesh: chain axis sharded across devices
        # how chains>1 execute on one chip: 'vmap' | 'scan' | 'auto'
        # (engine.make_epoch_fn docstring; auto = scan iff conv model)
        self.chain_strategy = chain_strategy
        self.hyperparameters = hyperparameters
        self._val_loss_cache = {}

    def shard_chain_state(self, state):
        """Place a chains-leading TrainState on the mesh, sharded over the
        'chain' axis — jit then partitions every epoch program across
        devices with no code changes (GSPMD)."""
        if self.mesh is None or self.chains <= 1:
            return state
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(self.mesh, P("chain"))
        return jax.tree.map(lambda x: jax.device_put(x, sharding), state)

    # -- protocol ------------------------------------------------------------

    def update_hyp(self, hyperparameters: dict):
        raise NotImplementedError

    def sample_iterative(self):
        raise NotImplementedError

    def sample(self, num_samples: Optional[int] = None) -> Ensemble:
        raise NotImplementedError

    # -- shared helpers --------------------------------------------------------

    def next_key(self) -> jax.Array:
        self.key, sub = jax.random.split(self.key)
        return sub

    def fresh_variables(self, key: Optional[jax.Array] = None) -> dict:
        """(Re-)initialize model variables — replaces ``reset_model``
        (util.py:92-107)."""
        key = key if key is not None else self.next_key()
        return init_variables(self.module, key, self.train.spec.shape)

    # -- elastic checkpointing -------------------------------------------------

    def enable_auto_checkpoint(self, path: str, every_epochs: int = 10,
                               resume: bool = True) -> bool:
        """Persist the chain state every N epochs; on construction with
        ``resume=True`` an existing checkpoint is restored so interrupted
        runs continue mid-chain (the elasticity upgrade over the
        reference's model-level loading, SURVEY.md §5). Returns True if a
        checkpoint was restored."""
        import os

        from ..utils_checkpoint import restore_sampler_state

        self._ckpt_path = path
        self._ckpt_every = max(1, int(every_epochs))
        if resume and os.path.exists(path):
            restore_sampler_state(path, self)
            return True
        return False

    def _maybe_checkpoint(self):
        path = getattr(self, "_ckpt_path", None)
        if path is None:
            return
        if self.epochs_run % self._ckpt_every == 0:
            from ..utils_checkpoint import save_sampler_state

            save_sampler_state(path, self)

    def compute_val_loss(self, val_split: DataSplit, params, batch_stats) -> float:
        cache_key = id(val_split)
        entry = self._val_loss_cache.get(cache_key)
        if entry is None or entry[0] is not val_split:
            entry = (val_split, make_eval_loss_fn(self.module, val_split))
            self._val_loss_cache[cache_key] = entry
        return float(entry[1](params, batch_stats))
