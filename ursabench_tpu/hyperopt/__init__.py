"""Hyperparameter optimization (parity with /root/reference/URSABench/hyperopt/).

Note: the reference package exports only GridSearch + BayesOpt and its
drivers import a nonexistent module (`URSABench.hyperOptimization`,
run_seq_hypOpt.py:7) — here all three searchers export cleanly.
"""

from .bayesopt import BayesOpt
from .gp import GP
from .search import GridSearch, RandomSearch, _HypOpt
from .vectorized import (batched_bayesopt, batched_bayesopt_sghmc,
                         vectorized_random_search)

__all__ = ["RandomSearch", "GridSearch", "BayesOpt", "GP", "_HypOpt",
           "vectorized_random_search", "batched_bayesopt",
           "batched_bayesopt_sghmc"]


def get_hypopt(name: str):
    import sys

    mod = sys.modules[__name__]
    if not hasattr(mod, name):
        raise KeyError(f"Unknown hyperopt method '{name}'")
    return getattr(mod, name)
