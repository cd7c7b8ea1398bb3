"""Multi-host process-group initialization (SURVEY.md §5.8).

The reference has no distributed backend at all; on TPU pods the process
group is ``jax.distributed`` and the collectives are XLA's over ICI/DCN.
One call per host process, before any other JAX API touches the backend:

    from relgat_projector_tpu.parallel import initialize_distributed
    initialize_distributed()          # TPU pod: everything auto-detected
    initialize_distributed(coordinator_address="host0:1234",
                           num_processes=4, process_id=rank)  # manual

After initialization, ``jax.devices()`` spans the whole slice and the mesh
helpers in ``parallel.mesh`` lay axes over it; ``data`` stays within a host
where possible and ``graph`` rides ICI.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize the multi-host process group; returns the process index.

    On TPU pods all arguments are auto-detected from the environment. Safe
    to call when already initialized (no-op) or single-process (returns 0).
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as exc:
        # Already initialized, or single-process without a coordinator
        # (non-pod environments raise 'coordinator_address should be
        # defined') — both are fine for single-process runs.
        if num_processes not in (None, 1) and "already" not in str(exc).lower():
            raise
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
