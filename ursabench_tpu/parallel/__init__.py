from .distributed import auto_mesh, chain_mesh, initialize
from .mesh import make_mesh, sharded_sghmc_step, shard_ensemble_eval

__all__ = [
    "make_mesh", "sharded_sghmc_step", "shard_ensemble_eval",
    "auto_mesh", "chain_mesh", "initialize",
]
