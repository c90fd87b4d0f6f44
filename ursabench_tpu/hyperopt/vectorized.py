"""Vectorized random/grid search: evaluate K hyperparameter configurations
in one device program via inference.vectorized.SGHMCSweep — the TPU-native
replacement for run_par_hypOpt.py's subprocess fan-out."""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import numpy as np

from ..inference.vectorized import SGHMCSweep
from .search import RandomSearch, _parse_domain


def vectorized_random_search(
    domain: Sequence[dict],
    module,
    train,
    task_factory: Callable,
    N_evaluations: int = 10,
    seed: int = 123,
    sgld: bool = False,
):
    """Draw N configs uniformly over the domain (logspace-aware), run them
    as one SGHMCSweep, return (best_hyp, best_obj, hyp_list, obj_list).

    The domain must pin 'num_samples' and 'burn_in_epochs' as constants
    (shared schedule length); 'lr', 'prior_std', 'alpha' may vary.
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
    sweep = SGHMCSweep(hyps, model=module, train=train,
                       key=jax.random.PRNGKey(seed))
    objs = sweep.objectives(task_factory)
    i = int(np.argmax(objs))
    return hyps[i], float(objs[i]), hyps, [float(o) for o in objs]
