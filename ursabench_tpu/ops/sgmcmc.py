"""SG-MCMC parameter-update kernels as fused pytree ops.

Parity target: the per-parameter update of ``optimSGHMC.step``
(/root/reference/URSABench/inference/optim_sghmc.py:43-67):

    d   = grad + (weight_decay / n_train) * p
    buf = momentum * buf_prev - lr * d        (first step: buf_prev := d)
    buf += noise * N(0,1) * sqrt(2*(1-momentum)*lr) / n_train
    p  += buf                                  (carry buf, incl. noise)

For ``momentum == 0`` (SGLD) this degenerates to ``p += -lr*d + noise`` with
no carried state — the unified formula below reproduces both cases exactly.
One pass over flat leaves => XLA fuses the whole update into a single
bandwidth-bound kernel per leaf; no optimizer object, no in-place mutation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..util import Pytree


def sghmc_update(
    params: Pytree,
    momentum_buf: Pytree,
    grads: Pytree,
    *,
    lr: jnp.ndarray,
    momentum: jnp.ndarray,
    wd_over_n: jnp.ndarray,
    n_train: jnp.ndarray,
    noise_on: jnp.ndarray,  # 0.0 / 1.0
    is_first_step: jnp.ndarray,  # bool scalar
    key: jax.Array,
):
    """One SGHMC/SGLD step over a whole parameter pytree.

    Returns (new_params, new_momentum_buf).
    """
    flat_p, treedef = jax.tree.flatten(params)
    flat_v = treedef.flatten_up_to(momentum_buf)
    flat_g = treedef.flatten_up_to(grads)
    noise_scale = jnp.sqrt(2.0 * (1.0 - momentum) * lr) / n_train

    # one fused Gaussian draw for the whole tree (a single threefry program
    # per step instead of one per leaf), sliced per leaf below
    sizes = [int(np.prod(p.shape)) for p in flat_p]
    offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
    eps_flat = jax.random.normal(key, (int(offsets[-1]),), jnp.float32)

    new_p, new_v = [], []
    for i, (p, v, g) in enumerate(zip(flat_p, flat_v, flat_g)):
        d = g + wd_over_n * p
        v_prev = jnp.where(is_first_step, d, v)
        v_new = momentum * v_prev - lr * d
        eps = eps_flat[int(offsets[i]): int(offsets[i + 1])].reshape(p.shape)
        v_new = v_new + noise_on * noise_scale * eps.astype(p.dtype)
        new_p.append(p + v_new)
        new_v.append(v_new)
    return jax.tree.unflatten(treedef, new_p), jax.tree.unflatten(treedef, new_v)


def sgd_momentum_update(
    params: Pytree,
    momentum_buf: Pytree,
    grads: Pytree,
    *,
    lr: jnp.ndarray,
    momentum: jnp.ndarray,
    weight_decay: jnp.ndarray,
    is_first_step: jnp.ndarray,
):
    """torch.optim.SGD(momentum=m, weight_decay=wd) semantics:
    d = g + wd*p; buf = m*buf + d (first step buf=d); p -= lr*d_eff where
    d_eff = buf when m != 0 else d. The unified form below covers both since
    m=0 makes buf == d. Used by SWA/SWAG/MCdropout/SGD baselines
    (swa.py:41, sgd.py:45)."""
    flat_p, treedef = jax.tree.flatten(params)
    flat_v = treedef.flatten_up_to(momentum_buf)
    flat_g = treedef.flatten_up_to(grads)

    new_p, new_v = [], []
    for p, v, g in zip(flat_p, flat_v, flat_g):
        d = g + weight_decay * p
        v_new = jnp.where(is_first_step, d, momentum * v + d)
        new_p.append(p - lr * v_new)
        new_v.append(v_new)
    return jax.tree.unflatten(treedef, new_p), jax.tree.unflatten(treedef, new_v)
