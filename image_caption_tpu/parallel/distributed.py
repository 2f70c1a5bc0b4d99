"""Multi-host / multi-slice initialization.

The reference has no distributed runtime at all (SURVEY.md §2.11 — no
torch.distributed/NCCL anywhere; two GPUs are used only for manual model
placement, ``/root/reference/core/config.py:32-48``).  On TPU pods the
story is: every host runs the same program, ``jax.distributed.initialize``
wires the cluster, and the (data, model, sequence) mesh spans all chips —
collectives ride ICI within a slice and DCN across slices (XLA picks this
from the device topology; megascale handles multi-slice meshes).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Idempotent ``jax.distributed.initialize`` — on Cloud TPU all three
    args auto-detect from the metadata server; pass them explicitly
    elsewhere.  Single-process runs are a no-op."""
    if jax.process_count() > 1:
        return                       # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except (ValueError, RuntimeError):
        # single-process (no coordinator configured): run locally
        pass


def process_batch_slice(global_batch: int) -> slice:
    """Each host feeds its shard of the global batch (per-host input
    sharding for pjit over the `data` axis)."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
