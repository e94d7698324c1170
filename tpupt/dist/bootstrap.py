"""Multi-host bootstrap — importable BEFORE the XLA backend exists.

`jax.distributed.initialize` must be the first backend-touching call in a
multi-host process.  This module therefore imports only `jax` itself (no
jax.numpy, no tpupt array code) so workers can do:

    from tpupt.dist.bootstrap import init_distributed
    init_distributed(coordinator, num_processes, process_id)
    from tpupt.dist.sharding import render_loss_and_grads_sharded  # now safe

`tpupt.dist.sharding` re-exports `init_distributed` for single-module
ergonomics once you don't care about import order (single-host).
"""

from __future__ import annotations

import jax


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host rendezvous (no-op on a single host when args are None).

    Wraps `jax.distributed.initialize`; afterwards `jax.devices()` sees the
    whole pod slice and `make_tile_mesh()` spans it.
    """
    if coordinator is None and num_processes is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
