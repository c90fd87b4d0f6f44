"""Posterior samplers (parity with /root/reference/URSABench/inference/).

Explicit exports — no wildcard-import ordering fragility (the reference's
``optimSGHMC`` is only importable because csghmc.py leaks it first; see
inference/__init__.py:1-11 there).
"""

from .base import _Inference
from .ensemble import Ensemble
from .sgmcmc import SGHMC, SGLD, cSGHMC, cSGLD

__all__ = ["_Inference", "Ensemble", "SGHMC", "SGLD", "cSGHMC", "cSGLD"]


def get_inference(name: str):
    import importlib

    mod = importlib.import_module(__name__)
    if not hasattr(mod, name):
        raise KeyError(f"Unknown inference method '{name}'")
    return getattr(mod, name)
