"""Posterior samplers (parity with /root/reference/URSABench/inference/).

Explicit exports — no wildcard-import ordering fragility (the reference's
``optimSGHMC`` is only importable because csghmc.py leaks it first; see
inference/__init__.py:1-11 there).
"""

from .base import _Inference
from .distill import distill_ensemble
from .ensemble import Ensemble
from .hmc import HMC
from .pca_subspace import PCASubspaceSampler
from .sgd_map import SGD, DeepEnsemble, MCdropout
from .sgmcmc import SGHMC, SGLD, cSGHMC, cSGLD
from .subspaces import Subspace, SubspaceModel
from .swa import SWA
from .vectorized import MethodSweep, SGHMCSweep
from .swag import SWAG

__all__ = [
    "_Inference", "Ensemble", "SGHMC", "SGLD", "cSGHMC", "cSGLD",
    "SGD", "DeepEnsemble", "MCdropout", "SWA", "SWAG", "PCASubspaceSampler",
    "HMC", "Subspace", "SubspaceModel", "distill_ensemble",
    "MethodSweep", "SGHMCSweep",
]


def get_inference(name: str):
    import sys

    mod = sys.modules[__name__]
    if not hasattr(mod, name):
        raise KeyError(f"Unknown inference method '{name}'")
    return getattr(mod, name)
