"""Multi-host glue: process initialization and batch partitioning.

Multi-host runs use ``jax.distributed.initialize`` plus a global mesh; each
process feeds its local shard of the stream batch and results gather in
stream order.  There is no custom transport: collectives ride ICI within a
slice and DCN across hosts through XLA (SURVEY.md P3).
"""

from __future__ import annotations

import os


def initialize_if_needed(coordinator: str | None = None) -> None:
    """Initialize jax.distributed from env when running multi-process.

    No-op for single-process runs.  Controlled by the standard JAX
    coordination env vars or an explicit coordinator address.
    """
    import jax

    if jax.process_count() > 1:
        return  # already initialized
    addr = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )


def local_batch_slice(global_batch: int) -> slice:
    """This process's contiguous slice of a globally sharded stream batch."""
    import jax

    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)


def global_mesh(shape=None):
    """A mesh spanning all processes' devices (streams x seq)."""
    from .shard import make_mesh
    import jax

    return make_mesh(shape, devices=jax.devices())
