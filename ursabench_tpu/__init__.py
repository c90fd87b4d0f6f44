"""URSABench-TPU: a TPU-native Bayesian deep learning benchmark framework.

A from-scratch JAX/XLA rebuild of the capability surface of URSABench
(posterior samplers -> stacked-pytree ensembles -> Bayesian-model-averaged
uncertainty tasks -> hyperparameter optimization -> latency profiling),
designed TPU-first: scanned sampler kernels, vmapped BMA evaluation, mesh
sharding for chains/data, and XLA-compiled latency profiling.
"""

__version__ = "0.1.0"

from . import data, inference, models, ops, tasks, util  # noqa: F401
