"""Vectorized random/grid search: evaluate K hyperparameter configurations
in one device program via inference.vectorized.MethodSweep — the TPU-native
replacement for run_par_hypOpt.py's subprocess fan-out (which was
method-agnostic, hyper_optimization.py:171-201 — so is this: any of
SGHMC/SGLD/cSGHMC/cSGLD/SGD sweeps through the same epoch program)."""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import numpy as np

from ..inference.vectorized import MethodSweep
from .search import RandomSearch, _parse_domain


def vectorized_random_search(
    domain: Sequence[dict],
    module,
    train,
    task_factory: Callable,
    N_evaluations: int = 10,
    seed: int = 123,
    sgld: bool = False,
    inference_method: str = "SGHMC",
    mesh=None,
):
    """Draw N configs uniformly over the domain (logspace-aware), run them
    as one MethodSweep, return (best_hyp, best_obj, hyp_list, obj_list).
    A ('chain','data') ``mesh`` shards the N configs over its 'chain' axis
    (chip-parallel configs; each config's batch data-sharded) — N must be a
    multiple of mesh.shape['chain'].

    ``inference_method`` picks the sampler (SGHMC/SGLD/cSGHMC/cSGLD/SGD);
    the domain must pin the method's schedule-shape integers as constants
    (e.g. 'num_samples'/'burn_in_epochs' for SGHMC, the cycle structure for
    cSGHMC); continuous hypers may vary. ``sgld=True`` is back-compat for
    inference_method='SGLD'-style alpha pinning.
    """
    rs = RandomSearch.__new__(RandomSearch)
    (rs.hyp_names, rs.hyp_names_vary, rs.param_space_vary_type,
     rs.param_space_vary, rs.bounds, rs.hyp_names_constant,
     rs.constants) = _parse_domain(domain)
    rs.seed = seed
    rs.N_evaluations = N_evaluations
    pts = rs._draw_points()
    hyps = [rs._mk_hyp(pts[i]) for i in range(N_evaluations)]
    if sgld:
        for h in hyps:
            h["alpha"] = 1.0
    sweep = MethodSweep(hyps, model=module, train=train,
                        key=jax.random.PRNGKey(seed),
                        method=inference_method, mesh=mesh)
    objs = _finite_or_neg_inf(sweep.objectives(task_factory))
    i = int(np.argmax(objs))
    return hyps[i], float(objs[i]), hyps, [float(o) for o in objs]


def _finite_or_neg_inf(objs):
    """Diverged configs (NaN objectives) must never win argmax."""
    return [float(o) if np.isfinite(o) else float("-inf") for o in objs]


def batched_bayesopt(
    domain: Sequence[dict],
    module,
    train,
    task_factory: Callable,
    rounds: int = 5,
    q: int = 4,
    init_evaluations: int = 4,
    seed: int = 123,
    beta: float = 0.1,
    sgld: bool = False,
    verbose: int = 0,
    inference_method: str = "SGHMC",
    mesh=None,
):
    """TPU-native batched Bayesian optimization (BASELINE.md config 5):
    each BO round proposes q diverse UCB candidates and evaluates ALL of
    them in one vectorized MethodSweep (any epoch-driven method) — the
    per-round wall time is ~one configuration's training run instead of q.
    With a ('chain','data') ``mesh`` the q candidates of every round train
    chip-parallel over the 'chain' axis (q and init_evaluations must be
    multiples of mesh.shape['chain']).

    Returns (best_hyp, best_obj, hyp_list, obj_list).
    """
    from .gp import GP, init_params
    import jax.numpy as jnp

    rs = RandomSearch.__new__(RandomSearch)
    (rs.hyp_names, rs.hyp_names_vary, rs.param_space_vary_type,
     rs.param_space_vary, rs.bounds, rs.hyp_names_constant,
     rs.constants) = _parse_domain(domain)
    rs.seed = seed
    rs.N_evaluations = init_evaluations
    pts = rs._draw_points()

    def evaluate(points):
        hyps = [rs._mk_hyp(p) for p in points]
        if sgld:
            for h in hyps:
                h["alpha"] = 1.0
        sweep = MethodSweep(hyps, model=module, train=train,
                            key=jax.random.PRNGKey(seed),
                            method=inference_method, mesh=mesh)
        return hyps, _finite_or_neg_inf(sweep.objectives(task_factory))

    hyp_list, obj_list = evaluate(pts)
    train_x = np.asarray(pts, np.float64)
    train_y = np.asarray(obj_list, np.float64)
    bounds = jnp.asarray(rs.bounds, jnp.float32)
    gp_params = init_params(train_x.shape[1])
    key = jax.random.PRNGKey(seed + 1)

    from .bayesopt import sanitize_targets

    for r in range(rounds):
        gp = GP(train_x, sanitize_targets(train_y), p0=gp_params)
        gp_params = gp.params
        key, k_acq = jax.random.split(key)
        batch = np.asarray(gp.optimize_ucb_batch(bounds, k_acq, q, beta=beta),
                           np.float64)
        bad = ~np.isfinite(batch).all(axis=1)
        if bad.any():
            key, k_rand = jax.random.split(key)
            lo, hi = np.asarray(rs.bounds[:, 0]), np.asarray(rs.bounds[:, 1])
            u = np.asarray(jax.random.uniform(k_rand, (int(bad.sum()), len(lo))))
            batch[bad] = lo + (hi - lo) * u
            gp_params = init_params(train_x.shape[1])
        new_hyps, new_objs = evaluate(batch)
        hyp_list.extend(new_hyps)
        obj_list.extend(new_objs)
        train_x = np.vstack([train_x, batch])
        train_y = np.append(train_y, new_objs)
        if verbose:
            print(f"round {r}: best so far {float(np.max(train_y)):.4f}")

    i = int(np.argmax(obj_list))
    return hyp_list[i], float(obj_list[i]), hyp_list, [float(o) for o in obj_list]


def batched_bayesopt_sghmc(*args, **kwargs):
    """Back-compat alias for batched_bayesopt (SGHMC default)."""
    return batched_bayesopt(*args, **kwargs)
