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


def _sort_rays_by_key(rays: RaySoA, key: jax.Array):
    """Reorder the whole wavefront by ``key`` with ONE multi-operand
    ``lax.sort`` carrying every per-ray field (13 scalar columns).

    An argsort followed by per-field gathers costs one permutation
    gather per column; the multi-operand sort moves all columns inside
    the sort network instead — measured ~100x cheaper at 160k lanes on
    v5e (see ops/traverse.py's identical pattern). Returns the permuted
    rays plus the permutation (as the sorted original lane index).
    """
    n = key.shape[0]
    lane = jnp.arange(n, dtype=jnp.int32)
    o, d, c = rays.origin, rays.direction, rays.color
    (_, perm,
     o0, o1, o2, d0, d1, d2, c0, c1, c2,
     inside, sdepth, pix, rem) = jax.lax.sort(
        (key, lane,
         o.x, o.y, o.z, d.x, d.y, d.z, c.x, c.y, c.z,
         rays.is_inside.astype(jnp.int32), rays.sdepth,
         rays.pixel_index, rays.remaining_bounces),
        num_keys=1,
        is_stable=True,
    )
    from kdtreepathtraceroptimization_tpu.ops.vecmath import V3

    out = RaySoA(
        origin=V3(o0, o1, o2),
        direction=V3(d0, d1, d2),
        color=V3(c0, c1, c2),
        is_inside=inside.astype(jnp.bool_),
        sdepth=sdepth,
        pixel_index=pix,
        remaining_bounces=rem,
    )
    return out, perm


def compact_rays(rays: RaySoA) -> Tuple[RaySoA, jax.Array]:
    """Stable-partition alive rays to the front (masked-lane analog of
    thrust::remove_if on remainingBounces==0, pathtrace.cu:103-110).

    Returns (permuted rays, number alive). The array length is
    unchanged — XLA needs static shapes — but dead lanes cluster at the
    tail where the traversal's while_loop retires them immediately.
    """
    alive = rays.remaining_bounces > 0
    # stable sort on (!alive) is a stable partition: alive lanes keep order.
    out, _ = _sort_rays_by_key(rays, jnp.logical_not(alive).astype(jnp.int32))
    return out, jnp.sum(alive.astype(jnp.int32))


def sort_rays_by_material(rays: RaySoA, material_id: jax.Array) -> Tuple[RaySoA, jax.Array]:
    """Cluster lanes by the material they just hit (the reference's
    thrust::sort by materialIdHit, pathtrace.cu:123-131, 2600-2606).

    Returns (permuted rays, permutation) so the caller can permute the
    matching intersection record the same way.
    """
    key = jnp.where(rays.remaining_bounces > 0, material_id, jnp.int32(0x7FFFFFFF))
    return _sort_rays_by_key(rays, key)


def sort_rays_by_octant(rays: RaySoA) -> RaySoA:
    """Cluster rays by direction octant — a TPU-specific locality
    optimization (SURVEY.md §7 'hard parts'): rays in the same octant
    traverse the KD tree in similar near/far order, so their node
    gathers coalesce."""
    d = rays.direction
    octant = (
        (d.x >= 0).astype(jnp.int32)
        + 2 * (d.y >= 0).astype(jnp.int32)
        + 4 * (d.z >= 0).astype(jnp.int32)
    )
    key = jnp.where(rays.remaining_bounces > 0, octant, jnp.int32(8))
    out, _ = _sort_rays_by_key(rays, key)
    return out
