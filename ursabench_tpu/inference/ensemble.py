"""Posterior ensembles as stacked pytrees.

The reference represents a posterior ensemble as ``List[nn.Module]`` deep
copies shuttled cpu<->gpu per batch (sghmc.py:99-101, prediction.py:56-64).
Here an ensemble is one pytree whose leaves carry a leading sample axis S;
the BMA forward is a single ``vmap``'d apply fused by XLA, so all S members
evaluate in one device program per batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..util import Pytree, tree_index, tree_stack


@dataclass
class Ensemble:
    """Stacked posterior samples of one architecture.

    params/batch_stats leaves have leading axis ``num_members``. For
    MC-dropout "ensembles" all members share weights but each carries its
    own dropout PRNG key (vi_dropout.py:87-117 semantics: the same
    stochastic model is returned S times).
    """

    module: Any  # flax module
    params: Pytree
    batch_stats: Optional[Pytree]
    num_members: int
    dropout_keys: Optional[jax.Array] = None  # (S, 2) uint32 keys
    _jit_cache: dict = field(default_factory=dict, repr=False)

    @staticmethod
    def from_list(module, variables_list) -> "Ensemble":
        params = tree_stack([v["params"] for v in variables_list])
        bs = None
        if variables_list and variables_list[0].get("batch_stats"):
            bs = tree_stack([v["batch_stats"] for v in variables_list])
        return Ensemble(module, params, bs, len(variables_list))

    def member(self, i: int) -> dict:
        v = {"params": tree_index(self.params, i)}
        if self.batch_stats is not None:
            v["batch_stats"] = tree_index(self.batch_stats, i)
        return v

    # -- vmapped BMA forward -------------------------------------------------

    def _member_logits(self, params, batch_stats, key, x, batch_idx):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        rngs = None
        if key is not None:
            rngs = {"dropout": jax.random.fold_in(key, batch_idx)}
        return self.module.apply(variables, x, train=False, rngs=rngs)

    def logits_fn(self) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
        """Jitted (x, batch_idx) -> (S, B, C) logits for all members."""
        if "logits" not in self._jit_cache:
            bs_axes = None if self.batch_stats is None else 0
            key_axes = None if self.dropout_keys is None else 0

            def all_logits(params, batch_stats, keys, x, batch_idx):
                return jax.vmap(
                    lambda p, b, k: self._member_logits(p, b, k, x, batch_idx),
                    in_axes=(0, bs_axes, key_axes),
                )(params, batch_stats, keys)

            jitted = jax.jit(all_logits)
            self._jit_cache["logits"] = lambda x, i: jitted(
                self.params, self.batch_stats, self.dropout_keys, x,
                jnp.asarray(i, jnp.int32),
            )
        return self._jit_cache["logits"]

    def logits_all(self, x: jnp.ndarray, batch_idx: int = 0) -> jnp.ndarray:
        return self.logits_fn()(x, batch_idx)
