"""Elliptical slice sampling as a jitted ``lax.while_loop``.

Parity target: the Murray/Bovy ESS port at
/root/reference/URSABench/util.py:287-354 (angle_range=None path: bracket
the whole ellipse at the first proposal, shrink toward the current point on
rejection). The reference evaluates the full-dataset log-density once per
proposed angle in Python; here the entire bracket-shrink loop, including
every log-density evaluation, is one compiled while_loop (SURVEY.md §3.4
identified this as the prime lax.while_loop target).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class _ESSCarry(NamedTuple):
    phi_min: jnp.ndarray
    phi_max: jnp.ndarray
    phi: jnp.ndarray
    xx: jnp.ndarray
    lnpdf_val: jnp.ndarray
    key: jax.Array
    accepted: jnp.ndarray
    iters: jnp.ndarray


def elliptical_slice(
    key: jax.Array,
    initial_theta: jnp.ndarray,
    prior_sample: jnp.ndarray,
    lnpdf: Callable[[jnp.ndarray], jnp.ndarray],
    cur_lnpdf: jnp.ndarray | None = None,
    max_iters: int = 1000,
):
    """One ESS transition. Returns (new_theta, new_lnpdf).

    ``prior_sample`` is a draw from the Gaussian prior (the reference's
    1-D `prior` branch, util.py:316-317).
    """
    k_h, k_phi, k_loop = jax.random.split(key, 3)
    if cur_lnpdf is None:
        cur_lnpdf = lnpdf(initial_theta)
    nu = prior_sample
    hh = jnp.log(jax.random.uniform(k_h)) + cur_lnpdf

    phi0 = jax.random.uniform(k_phi) * 2.0 * jnp.pi
    init = _ESSCarry(
        phi_min=phi0 - 2.0 * jnp.pi,
        phi_max=phi0,
        phi=phi0,
        xx=initial_theta,
        lnpdf_val=cur_lnpdf,
        key=k_loop,
        accepted=jnp.asarray(False),
        iters=jnp.asarray(0, jnp.int32),
    )

    def cond(c: _ESSCarry):
        return jnp.logical_and(~c.accepted, c.iters < max_iters)

    def body(c: _ESSCarry):
        xx_prop = initial_theta * jnp.cos(c.phi) + nu * jnp.sin(c.phi)
        val = lnpdf(xx_prop)
        accepted = val > hh
        # shrink bracket toward the rejected angle (util.py:346-350);
        # phi == 0 would be the reference's "BUG DETECTED" branch — treated
        # as a min-side shrink, which terminates identically.
        shrink_max = jnp.logical_and(~accepted, c.phi > 0)
        phi_max = jnp.where(shrink_max, c.phi, c.phi_max)
        phi_min = jnp.where(jnp.logical_and(~accepted, c.phi <= 0), c.phi, c.phi_min)
        key, k_u = jax.random.split(c.key)
        new_phi = jax.random.uniform(k_u) * (phi_max - phi_min) + phi_min
        return _ESSCarry(
            phi_min=phi_min,
            phi_max=phi_max,
            phi=jnp.where(accepted, c.phi, new_phi),
            xx=jnp.where(accepted, xx_prop, c.xx),
            lnpdf_val=jnp.where(accepted, val, c.lnpdf_val),
            key=key,
            accepted=accepted,
            iters=c.iters + 1,
        )

    out = jax.lax.while_loop(cond, body, init)
    return out.xx, out.lnpdf_val
