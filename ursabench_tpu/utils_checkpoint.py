"""Checkpoint / resume — npz-backed pytree persistence.

The reference only supports model-level state-dict loading
(/root/reference/URSABench/experiment.py:36,72-73) and BO best-hyp JSON
checkpoints (hyper_optimization.py:561-566). Here checkpointing is a
first-class upgrade (SURVEY.md §5): any dict-structured pytree (model
variables, stacked ensembles, sampler TrainState) round-trips through a
single .npz with '/'-joined key paths, enabling mid-chain resume.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

SCALAR_KEY = "__scalar__"


def _key_data(key):
    """uint32 view of a PRNG key, typed or raw (PRNGKey returns raw)."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        return jax.random.key_data(key)
    return key


def _wrap_key(data, was_typed: bool):
    return jax.random.wrap_key_data(jnp.asarray(data)) if was_typed else jnp.asarray(data)


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_pytree(path: str, tree: Any) -> None:
    np.savez(path, **_flatten(tree))


def load_pytree(path: str) -> Any:
    with np.load(path) as z:
        return _unflatten({k: z[k] for k in z.files})


def save_variables(path: str, variables: dict) -> None:
    save_pytree(path, dict(variables))


def load_variables(path: str) -> dict:
    return load_pytree(path)


def save_ensemble(path: str, ensemble) -> None:
    tree = {"params": ensemble.params, "num_members": ensemble.num_members}
    if ensemble.batch_stats is not None:
        tree["batch_stats"] = ensemble.batch_stats
    if ensemble.dropout_keys is not None:
        tree["dropout_keys"] = _key_data(ensemble.dropout_keys)
        tree["dropout_keys_typed"] = np.asarray(
            1 if jnp.issubdtype(ensemble.dropout_keys.dtype, jax.dtypes.prng_key)
            else 0
        )
    save_pytree(path, tree)


def load_ensemble(path: str, module):
    from .inference.ensemble import Ensemble

    tree = load_pytree(path)
    dropout_keys = None
    if "dropout_keys" in tree:
        dropout_keys = _wrap_key(
            tree["dropout_keys"], bool(int(tree["dropout_keys_typed"]))
        )
    return Ensemble(
        module,
        tree["params"],
        tree.get("batch_stats"),
        int(tree["num_members"]),
        dropout_keys=dropout_keys,
    )


def save_sampler_state(path: str, sampler) -> None:
    """Persist a TrainState-driven sampler's chain state + epoch counter."""
    st = sampler._state
    save_pytree(path, {
        "params": st.params,
        "momentum": st.momentum,
        "batch_stats": st.batch_stats,
        "key": _key_data(st.key),
        "key_typed": np.asarray(
            1 if jnp.issubdtype(st.key.dtype, jax.dtypes.prng_key) else 0
        ),
        "step": st.step,
        "epochs_run": np.asarray(sampler.epochs_run),
        "burnt_in": np.asarray(1 if getattr(sampler, "burnt_in", False) else 0),
    })


def restore_sampler_state(path: str, sampler) -> None:
    from .inference.engine import TrainState

    tree = load_pytree(path)
    sampler._state = TrainState(
        params=tree["params"],
        momentum=tree["momentum"],
        batch_stats=tree.get("batch_stats", {}),
        key=_wrap_key(tree["key"], bool(int(tree["key_typed"]))),
        step=tree["step"].astype(jnp.int32),
    )
    sampler.epochs_run = int(tree["epochs_run"])
    sampler.burnt_in = bool(int(tree["burnt_in"]))
