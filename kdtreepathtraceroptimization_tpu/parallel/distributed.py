"""Multi-host entry (SURVEY.md §2.7 "distributed comm backend" row).

The reference is single-process with zero comms; the TPU-native scaling
path is standard JAX multi-controller: every host calls
``init_distributed()`` before first device use, after which
``jax.devices()`` spans the whole slice/pod and the sharded render
functions (parallel/sharding.py) run unchanged — film/rays shard over
all chips, scene tables replicate, gradient psums ride ICI within a
slice and DCN across hosts.

Launch pattern (one process per host):

    JAX_COORDINATOR=host0:8476 NPROC=4 PROC_ID=$i python render_job.py

with ``init_distributed()`` as the first call in ``render_job.py``.
"""

from __future__ import annotations

import os
from typing import Optional


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize JAX multi-host; returns True when distributed.

    Arguments default from the environment (``JAX_COORDINATOR``,
    ``NPROC``, ``PROC_ID``), falling back to JAX's own cluster
    auto-detection (TPU pods populate it from metadata). Single-process
    runs (no coordinator configured) return False and change nothing —
    callers can use the same script on a laptop and on a pod.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR")
    num_processes = num_processes or _int_env("NPROC")
    process_id = process_id if process_id is not None else _int_env("PROC_ID")

    if coordinator_address is None and num_processes is None:
        # TPU pods auto-detect via metadata; only attempt when running
        # on a multi-host platform to avoid hanging single-host runs.
        if os.environ.get("TPU_WORKER_HOSTNAMES"):
            jax.distributed.initialize()
            return jax.process_count() > 1
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None
