"""Core utilities: pytree <-> flat-vector plumbing, PRNG handling, smoothing,
entropy, JSON helpers.

TPU-native reimagination of the reference's ``URSABench/util.py``
(/root/reference/URSABench/util.py:110-176 flatten/unflatten,
:126-144 smoothing/entropy, :147-160 JSON helpers). Instead of mutating
``nn.Module`` parameters in place, everything here operates on immutable JAX
pytrees; posterior ensembles are *stacked pytrees* with a leading sample axis.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Pytree = Any

# ---------------------------------------------------------------------------
# Seeding / PRNG
# ---------------------------------------------------------------------------


def make_key(seed: int | None = None) -> jax.Array:
    """Create a root PRNG key. ``seed=None`` derives one from wall-clock time,
    mirroring the reference's time-derived default seed
    (/root/reference/URSABench/util.py:20-29)."""
    if seed is None:
        seed = int((time.time() * 1e6) % 1e8)
    return jax.random.PRNGKey(seed)


def split_like(key: jax.Array, tree: Pytree) -> Pytree:
    """Split ``key`` into one key per leaf of ``tree`` (same treedef)."""
    leaves, treedef = jax.tree.flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree.unflatten(treedef, list(keys))


# ---------------------------------------------------------------------------
# Pytree <-> flat vector
# ---------------------------------------------------------------------------


def tree_size(tree: Pytree) -> int:
    """Total number of scalar parameters in a pytree."""
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(tree))


def ravel(tree: Pytree) -> jnp.ndarray:
    """Flatten a pytree of arrays into one 1-D vector (replaces
    ``util.flatten``, /root/reference/URSABench/util.py:163-169)."""
    leaves = jax.tree.leaves(tree)
    if not leaves:
        return jnp.zeros((0,), jnp.float32)
    return jnp.concatenate([jnp.reshape(l, (-1,)) for l in leaves])


def unraveler(tree: Pytree) -> Callable[[jnp.ndarray], Pytree]:
    """Return a function mapping a flat vector back to ``tree``'s structure
    (replaces ``hamiltorch.util.unflatten`` usage at
    /root/reference/URSABench/util.py:110-123)."""
    leaves, treedef = jax.tree.flatten(tree)
    shapes = [l.shape for l in leaves]
    sizes = [int(np.prod(s)) for s in shapes]
    dtypes = [l.dtype for l in leaves]
    offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)

    def unravel(vec: jnp.ndarray) -> Pytree:
        parts = [
            jnp.reshape(vec[int(offsets[i]): int(offsets[i + 1])], shapes[i]).astype(dtypes[i])
            for i in range(len(shapes))
        ]
        return jax.tree.unflatten(treedef, parts)

    return unravel


def tree_stack(trees: Sequence[Pytree]) -> Pytree:
    """Stack a list of identically-structured pytrees along a new leading
    axis — the TPU-native replacement for the reference's
    ``List[nn.Module]`` ensemble representation."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def tree_index(tree: Pytree, i: int) -> Pytree:
    """Select sample ``i`` from a stacked pytree."""
    return jax.tree.map(lambda x: x[i], tree)


def tree_zeros_like(tree: Pytree) -> Pytree:
    return jax.tree.map(jnp.zeros_like, tree)


# ---------------------------------------------------------------------------
# Probability helpers (parity with reference formulas)
# ---------------------------------------------------------------------------


def central_smoothing(proba: jnp.ndarray, gamma: float = 1e-4) -> jnp.ndarray:
    """``(1-g)*p + g/K`` — Malinin et al. central smoothing
    (/root/reference/URSABench/util.py:126-134)."""
    return (1.0 - gamma) * proba + gamma / proba.shape[-1]


def predictive_entropy(proba: jnp.ndarray) -> jnp.ndarray:
    """``-sum p log p`` over the class axis
    (/root/reference/URSABench/util.py:137-144)."""
    return -jnp.sum(proba * jnp.log(proba), axis=-1)


def softmax_probs(logits: jnp.ndarray) -> jnp.ndarray:
    """exp(log_softmax(logits)) — numerically matches the reference's
    ``F.log_softmax(...).exp_()`` accumulation (prediction.py:60)."""
    return jnp.exp(jax.nn.log_softmax(logits, axis=-1))


# ---------------------------------------------------------------------------
# JSON / misc helpers
# ---------------------------------------------------------------------------


def json_open_from_file(path: str) -> dict:
    if not os.path.exists(path):
        raise FileNotFoundError(f"The file {path} does not exist!")
    with open(path, encoding="utf-8") as f:
        return json.loads(f.read())


def make_dic_json_format(dic: dict) -> dict:
    """Convert array-like values to plain floats for JSON output
    (/root/reference/URSABench/util.py:155-160)."""
    out = {}
    for k, v in dic.items():
        if isinstance(v, (jnp.ndarray, np.ndarray)):
            out[k] = float(v) if np.ndim(v) == 0 or np.size(v) == 1 else np.asarray(v).tolist()
        elif isinstance(v, (np.floating, np.integer)):
            out[k] = float(v)
        else:
            out[k] = v
    return out


def list_to_dic(names: Iterable[str], values: Sequence) -> dict:
    return {name: values[i] for i, name in enumerate(names)}


def enable_compilation_cache(path: str = "/tmp/ursabench_jax_cache") -> None:
    """Enable JAX's persistent compilation cache. Sampler instances create
    fresh jit closures (one per trial/seed in the reference protocols), and
    without the cache every instance recompiles identical HLO — on the
    remote-compile TPU path that's 30-90s per trial vs ~1s with the cache.
    Called by the CLI drivers and bench."""
    import os

    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
