"""Mesh parallelism API. The production multi-chip path is
``make_epoch_fn(mesh=...)`` (reached via ``SGHMC/cSGHMC/SWA/SWAG(..., mesh=)``
and ``experiment.py --mesh auto``); ``sharded_sghmc_step`` in
``parallel.mesh`` is a self-contained teaching example of the shard_map
pattern and is deliberately NOT re-exported here (import it from
``ursabench_tpu.parallel.mesh`` if you want the walkthrough)."""

from .distributed import auto_mesh, chain_mesh, initialize
from .mesh import make_mesh, shard_ensemble_eval

__all__ = [
    "make_mesh", "shard_ensemble_eval",
    "auto_mesh", "chain_mesh", "initialize",
]
