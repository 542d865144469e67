"""Multi-host initialization + per-host data-plane helpers.

The reference is single-machine (SURVEY.md section 2.4). Multi-host
here is plain JAX: ``jax.distributed.initialize()`` before first device
use, per-host shard ownership for the input pipeline
(pipeline.input.host_shard_files), and
``make_array_from_process_local_data`` to assemble global batches
(parallel.sharding.shard_batch_local). No NCCL/MPI layer -- XLA
collectives over ICI/DCN are the transport.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX. No-ops when single-process (so the
    same entrypoint works on a laptop and a pod slice). Arguments
    default to the standard env vars / TPU metadata autodetection."""
    if num_processes is None:
        num_processes = int(os.environ.get("DLSEG_NUM_PROCESSES", "0")) or None
    if coordinator_address is None:
        # jax.distributed reads JAX_COORDINATOR_ADDRESS itself; the
        # un-prefixed spelling must be forwarded explicitly or the
        # env-var-driven startup crashes on coordinator_address=None
        coordinator_address = os.environ.get("COORDINATOR_ADDRESS")
    if process_id is None:
        pid = os.environ.get("DLSEG_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    if num_processes in (None, 1) and coordinator_address is None \
            and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def is_primary() -> bool:
    """True on the process that should write checkpoints / logs."""
    return jax.process_index() == 0
