"""Multi-host bring-up helpers.

The reference is strictly single-process (SURVEY.md §2); multi-host scale-out
is new surface in the TPU build.  JAX SPMD needs one `jax.distributed`
initialization per process before any device use; afterwards `make_mesh()`
spans every chip in the slice and per-host shards of a "data"-sharded batch
stay host-local automatically.
"""
from __future__ import annotations

import os
from typing import Optional


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize jax.distributed (idempotent), returning the process index.

    With no arguments, relies on the TPU runtime's automatic discovery (GCE
    metadata / megascale env), which covers standard pod-slice deployments;
    explicit args support bring-your-own clusters:

        init_distributed("10.0.0.1:1234", num_processes=4, process_id=rank)
    """
    import jax

    if getattr(jax.distributed, "is_initialized", lambda: False)():
        return jax.process_index()
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError) as e:
        # Single-process runs (no cluster env): proceed undistributed.
        if num_processes not in (None, 1):
            raise
        if os.environ.get("SGT_DEBUG"):
            print(f"init_distributed: single-process fallback ({e})")
    return jax.process_index()


def local_lane_slice(total_lanes: int) -> slice:
    """The [start, stop) lane range owned by this process when `total_lanes`
    shard evenly over processes along the "data" axis."""
    import jax

    n = jax.process_count()
    if total_lanes % n:
        raise ValueError(f"lanes {total_lanes} not divisible by {n} processes")
    per = total_lanes // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
