"""Multi-host initialization + chain-mesh helpers.

The reference has no distributed layer (SURVEY.md §2.9); its cross-process
channel is a CSV file. Here multi-host runs use ``jax.distributed`` (one
process per host, devices glued into one global mesh) and chain parallelism
is just a mesh axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Wire up multi-host JAX (ICI within slice, DCN across). No-op for
    single-process runs."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def auto_mesh(chains: int, batch_size: Optional[int] = None,
              n_devices: Optional[int] = None) -> Optional[Mesh]:
    """('chain', 'data') mesh over the available devices for a given chain
    count: the chain axis is the largest device divisor that also divides
    ``chains``; the remaining devices become data parallelism (shrunk to
    divide ``batch_size`` when given). None on a single device — the
    single-chip epoch program needs no mesh."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n <= 1:
        return None
    cd = 1
    for d in range(min(chains, n), 0, -1):
        if n % d == 0 and chains % d == 0:
            cd = d
            break
    dd = n // cd
    if batch_size is not None:
        while dd > 1 and batch_size % dd:
            dd -= 1
    if cd * dd <= 1:
        # nothing shardable (e.g. chains=1 + batch_size coprime with every
        # device-count divisor): behave like the single-device case rather
        # than returning a degenerate 1x1 mesh the epoch builders reject
        return None
    arr = np.asarray(devices[: cd * dd]).reshape(cd, dd)
    return Mesh(arr, ("chain", "data"))


def chain_mesh(chains: int, n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over min(chains, devices) for chain-sharded sampling: pass
    to a sampler's ``mesh=`` with ``chains=`` a multiple of the mesh size."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    use = min(chains, n)
    while chains % use:
        use -= 1
    return Mesh(np.asarray(devices[:use]), ("chain",))
