from .distributed import chain_mesh, initialize
from .mesh import make_mesh, sharded_sghmc_step, shard_ensemble_eval

__all__ = [
    "make_mesh", "sharded_sghmc_step", "shard_ensemble_eval",
    "chain_mesh", "initialize",
]
