"""Stream compaction and material sorting, TPU style.

The reference shrinks the active path list with ``thrust::remove_if``
each bounce (pathtrace.cu:2591-2597) and sorts paths by material id to
reduce warp divergence (pathtrace.cu:2600-2606). On TPU neither concern
exists in the same form: shapes must be static (no shrinking) and there
are no warps to diverge — masked lanes already execute in lockstep at
full VPU width. What CAN pay is *clustering*: sorting lanes so alive
rays (or same-material rays) are contiguous improves gather locality in
the traversal (nearby rays walk nearby nodes).

These transforms permute the wavefront; ``pixel_index`` rides along so
the film scatter stays correct (the reference keeps pixelIndex in
PathSegment for the same reason, sceneStructs.h:66-74).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.ops.camera import RaySoA


def _permute_rays(rays: RaySoA, perm: jax.Array) -> RaySoA:
    return RaySoA(*(f[perm] for f in rays))


def compact_rays(rays: RaySoA) -> Tuple[RaySoA, jax.Array]:
    """Stable-partition alive rays to the front (masked-lane analog of
    thrust::remove_if on remainingBounces==0, pathtrace.cu:103-110).

    Returns (permuted rays, number alive). The array length is
    unchanged — XLA needs static shapes — but dead lanes cluster at the
    tail where the traversal's while_loop retires them immediately.
    """
    alive = rays.remaining_bounces > 0
    # argsort of (!alive) is a stable partition: alive lanes keep order.
    perm = jnp.argsort(jnp.logical_not(alive), stable=True)
    return _permute_rays(rays, perm), jnp.sum(alive.astype(jnp.int32))


def sort_rays_by_material(rays: RaySoA, material_id: jax.Array) -> Tuple[RaySoA, jax.Array]:
    """Cluster lanes by the material they just hit (the reference's
    thrust::sort by materialIdHit, pathtrace.cu:123-131, 2600-2606).

    Returns (permuted rays, permutation) so the caller can permute the
    matching intersection record the same way.
    """
    key = jnp.where(rays.remaining_bounces > 0, material_id, jnp.int32(0x7FFFFFFF))
    perm = jnp.argsort(key, stable=True)
    return _permute_rays(rays, perm), perm


def sort_rays_by_octant(rays: RaySoA) -> RaySoA:
    """Cluster rays by direction octant — a TPU-specific locality
    optimization (SURVEY.md §7 'hard parts'): rays in the same octant
    traverse the KD tree in similar near/far order, so their node
    gathers coalesce."""
    d = rays.direction
    octant = (
        (d[:, 0] >= 0).astype(jnp.int32)
        + 2 * (d[:, 1] >= 0).astype(jnp.int32)
        + 4 * (d[:, 2] >= 0).astype(jnp.int32)
    )
    key = jnp.where(rays.remaining_bounces > 0, octant, jnp.int32(8))
    return _permute_rays(rays, jnp.argsort(key, stable=True))
