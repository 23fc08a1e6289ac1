"""KD-tree visualization mode (the reference's key-V feature).

Re-design of pathTraceOneBounceKDbareBoxes (reference:
src/pathtrace.cu:1738-1885): every KD node's AABB is rendered as a
solid box. Instead of a per-thread loop over nodes, the whole [N_rays]
x [M_nodes] slab test runs as one chunked broadcast; boxes are shaded
by a depth-tinted face color so tree levels are distinguishable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.ops.intersect import BIG, intersect_aabb


def render_kd_boxes(origin, direction, kd, max_nodes_per_chunk: int = 256,
                    leaves_only: bool = True):
    """Return an [N, 3] color image of the nearest node AABB per ray.

    ``leaves_only`` shows the leaf-cell mosaic (internal boxes fully
    enclose their children, so the nearest internal hit is always the
    root's front face — not informative).
    """
    bmin = jnp.asarray(kd.nodes.bbox_min)
    bmax = jnp.asarray(kd.nodes.bbox_max)
    if leaves_only:
        is_leaf = (jnp.asarray(kd.nodes.axis) < 0)[:, None]
        # degenerate far-away box for internal nodes -> never hit
        bmin = jnp.where(is_leaf, bmin, 1e29)
        bmax = jnp.where(is_leaf, bmax, 1e29)
    m = bmin.shape[0]
    n = origin.shape[0]

    # node depth for tinting: root=0, child = parent+1
    parent = jnp.asarray(kd.nodes.parent)

    def depth_body(_, d):
        pd = jnp.where(parent >= 0, d[jnp.maximum(parent, 0)] + 1, 0)
        return pd

    depth = jax.lax.fori_loop(
        0, kd.max_depth + 1, depth_body, jnp.zeros((m,), jnp.int32)
    )

    pad = (-m) % max_nodes_per_chunk
    if pad:
        bmin = jnp.concatenate([bmin, jnp.full((pad, 3), 1e29)], axis=0)
        bmax = jnp.concatenate([bmax, jnp.full((pad, 3), 1e29)], axis=0)
        depth = jnp.concatenate([depth, jnp.zeros((pad,), jnp.int32)])
    chunks = bmin.shape[0] // max_nodes_per_chunk

    def body(c, carry):
        best_t, best_node = carry
        s = c * max_nodes_per_chunk
        cb_min = jax.lax.dynamic_slice_in_dim(bmin, s, max_nodes_per_chunk)
        cb_max = jax.lax.dynamic_slice_in_dim(bmax, s, max_nodes_per_chunk)
        hit, dist = intersect_aabb(
            origin[:, None, :], direction[:, None, :], cb_min[None], cb_max[None]
        )
        dist = jnp.where(hit & (dist > 0), dist, BIG)
        local = jnp.argmin(dist, axis=1)
        rows = jnp.arange(n)
        lt = dist[rows, local]
        better = lt < best_t
        return (
            jnp.where(better, lt, best_t),
            jnp.where(better, s + local.astype(jnp.int32), best_node),
        )

    best_t, best_node = jax.lax.fori_loop(
        0, chunks, body, (jnp.full((n,), BIG, jnp.float32), jnp.full((n,), -1, jnp.int32))
    )

    hit = best_node >= 0
    d = depth[jnp.maximum(best_node, 0)].astype(jnp.float32)
    tint = d / jnp.maximum(float(kd.max_depth), 1.0)
    color = jnp.stack(
        [1.0 - tint, jnp.abs(0.5 - tint) * 2.0, tint], axis=-1
    )
    shade = jnp.exp(-0.03 * jnp.where(hit, best_t, 0.0))[:, None]
    return jnp.where(hit[:, None], color * shade, 0.0)
