from .sgmcmc import sghmc_update, sgd_momentum_update

__all__ = ["sghmc_update", "sgd_momentum_update"]
