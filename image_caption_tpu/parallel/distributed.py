"""Multi-host / multi-slice initialization.

The reference has no distributed runtime at all (SURVEY.md §2.11 — no
torch.distributed/NCCL anywhere; two GPUs are used only for manual model
placement, ``/root/reference/core/config.py:32-48``).  On TPU pods the
story is: every host runs the same program, ``jax.distributed.initialize``
wires the cluster, and the (data, model, sequence) mesh spans all chips —
collectives ride ICI within a slice and DCN across slices (XLA picks this
from the device topology; megascale handles multi-slice meshes).

ORDERING MATTERS: ``initialize`` must run before ANYTHING touches the JAX
backend — even a bare ``jax.devices()`` / ``jax.process_count()`` call
initializes a single-process backend and makes a later coordinator
connect impossible.  This module therefore never queries the backend to
decide whether to connect; idempotency is a plain module flag, and the
CLI (``main.py --distributed``) calls it first thing.
"""

from __future__ import annotations

from typing import Optional

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Connect this process to the cluster (idempotent).

    On Cloud TPU all three args auto-detect from the metadata server;
    pass them explicitly elsewhere (e.g. the CPU-mesh dryrun).  Only call
    this when a multi-process run is actually intended — unlike the r2
    version there is no silent single-process fallback, so a bad
    coordinator config fails loudly instead of training on 1/N of the
    pod.
    """
    global _initialized
    if is_initialized():
        return
    import jax
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        # belt-and-braces for is_initialized()'s private-API probe: if a
        # future jax moves global_state and the probe misses an external
        # initialization, treat the double-init error as the no-op it
        # should have been rather than crashing the launcher
        if "already initialized" not in str(e).lower():
            raise
    _initialized = True


def is_initialized() -> bool:
    """True when the distributed runtime is connected — via this wrapper
    OR directly through ``jax.distributed.initialize`` (e.g. an embedding
    launcher); ``initialize()`` must no-op in both cases.  Inspecting
    ``jax.distributed``'s client state does NOT initialize the XLA
    backend, so the ordering contract above is preserved."""
    if _initialized:
        return True
    import jax
    if hasattr(jax.distributed, "is_initialized"):     # public (jax>=0.4.34)
        return bool(jax.distributed.is_initialized())
    try:
        from jax._src import distributed as _jax_distributed
        return _jax_distributed.global_state.client is not None
    except Exception:
        return False
