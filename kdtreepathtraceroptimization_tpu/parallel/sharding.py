"""Multi-chip / multi-host parallelism.

The reference has NO distributed capability — its only parallel axis is
one-CUDA-thread-per-path on one GPU (SURVEY.md §2.7). The TPU-native
scaling design:

- **Rays/pixels shard** across devices along the flat pixel axis
  (film, ray state, per-bounce uniforms all [N, ...] → [N/n_dev, ...]
  per chip).
- **Scene data replicates**: geoms, materials, mesh, flattened KD
  arrays live whole on every chip (the reference's dragon KD flat is a
  few hundred MB at worst — fits HBM).
- **Collectives**: the forward pass needs none (each chip owns its
  pixels); the backward pass all-reduces material/vertex/camera
  gradients, which XLA GSPMD inserts automatically as ``psum`` over ICI
  when gradients of replicated params are requested.

We drive this with ``jax.jit`` + sharding annotations (GSPMD) rather
than hand-written shard_map: the program is a pure map over pixels, so
the partitioner's choice is exactly ours, and the same jitted function
runs single-chip, 8 virtual CPU devices, or a v5 pod slice unchanged.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.render.integrator import trace_iteration


def make_mesh(devices: Optional[Sequence] = None, axis: str = "rays") -> Mesh:
    """1-D device mesh over the ray/pixel axis.

    Multi-host: pass ``jax.devices()`` after ``jax.distributed.initialize``
    — the flat pixel axis shards across all chips; DCN only carries the
    gradient psum (overlapped by XLA with the backward bounce loop).
    """
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis,))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_devices(n: int, n_dev: int) -> int:
    return (n + n_dev - 1) // n_dev * n_dev


def make_sharded_render_fn(scene, config: RenderConfig, mesh: Mesh):
    """Jitted render step with the film sharded over the ray axis.

    Returns ``step(film, base_key, iteration) -> film`` where ``film``
    is [N, 3] laid out with ``ray_sharding(mesh)``. The radiance
    computation inherits the film's sharding: raygen's iota, the bounce
    scan, gathers of replicated scene tables — all partition along the
    pixel axis with zero communication.
    """
    film_sharding = ray_sharding(mesh)
    geoms, materials, msh, kd, camera = (
        scene.geoms,
        scene.materials,
        scene.mesh,
        scene.kd,
        scene.camera,
    )
    cmesh = getattr(scene, "cmesh", None)

    @functools.partial(
        jax.jit,
        donate_argnums=(0,),
        in_shardings=(film_sharding, None, None),
        out_shardings=film_sharding,
    )
    def render_step(film, base_key, iteration):
        from kdtreepathtraceroptimization_tpu.parallel import ctx

        # Activate the ambient sharding context for the trace so the
        # intersectors pin their [shards, n/shards] intermediates
        # (see parallel/ctx.py — GSPMD otherwise all-gathers inside
        # their while-loop bodies).
        with ctx.active(mesh, mesh.axis_names[0]):
            radiance = trace_iteration(
                geoms, materials, msh, kd, camera, config, base_key,
                iteration, cmesh=cmesh,
            )
        return film + radiance

    return render_step


def device_film(n_pixels: int, mesh: Mesh) -> jax.Array:
    """Zero-initialized film placed with the ray sharding."""
    return jax.device_put(
        jnp.zeros((n_pixels, 3), jnp.float32), ray_sharding(mesh)
    )
