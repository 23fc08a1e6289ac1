"""Wavefront path-tracing integrator.

Re-design of the reference's host orchestrator + megakernels
(src/pathtrace.cu:2405-2635). The CUDA design launches one
intersect+scatter megakernel and a shade kernel per bounce, compacting
the path list with thrust between bounces. The TPU-native design is a
single jitted program per iteration:

    raygen -> lax.scan over bounces { intersect; gather materials;
              scatter; shade } -> per-pixel radiance

with masked lanes instead of dynamic compaction (XLA needs static
shapes; terminated lanes simply stop contributing — SURVEY.md §2.7).
The scan is unrolled by XLA into a fused chain of vector ops; there is
no kernel-launch overhead to amortize and no warp divergence to sort
away, so the reference's material-sort (pathtrace.cu:2600-2606) is a
no-op here and compaction is optional.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.ops import bsdf, intersect as isect, mesh as mesh_ops, shade
from kdtreepathtraceroptimization_tpu.ops import vecmath as vm
from kdtreepathtraceroptimization_tpu.ops.camera import RaySoA, generate_rays
from kdtreepathtraceroptimization_tpu.ops.rng import bounce_key, uniform_cols


def intersect_scene(origin, direction, geoms, materials, mesh, kd,
                    config: RenderConfig, active=None, cmesh=None):
    """Nearest hit against analytic geoms + (optional) triangle mesh.

    Mirrors the dispatch in pathtrace() (reference: pathtrace.cu:2483-2559):
    brute force vs KD-tree is a static config choice. Analytic geoms are
    intersected FIRST so their nearest t bounds the KD walk (subtree
    pruning), and ``active`` lets terminated wavefront lanes skip the
    traversal entirely — both are pure wins the megakernel design
    couldn't express.

    ``origin``/``direction``: V3 of [N] channels or [N, 3] arrays. The
    triangle intersectors consume [N, 3] (their tables/kernels are
    row-oriented); the conversion happens once here per bounce.
    """
    hit = isect.intersect_geoms(origin, direction, geoms)
    if mesh is not None:
        if isinstance(origin, vm.V3):
            origin = vm.v3_to_rows(origin)
        if isinstance(direction, vm.V3):
            direction = vm.v3_to_rows(direction)
        # Production auto-select (config.cluster_auto): big meshes take
        # the cluster family, small ones the KD walk — the measured TPU
        # crossover (config.cluster_min_tris). Static per compile: the
        # mesh size is a trace-time constant.
        use_cluster = cmesh is not None and (
            config.cluster
            or (config.cluster_auto
                and int(mesh.v0.shape[0]) >= config.cluster_min_tris)
        )
        if use_cluster:
            if getattr(config, "cluster_pairs", False):
                from kdtreepathtraceroptimization_tpu.ops.pairs import (
                    intersect_mesh_pairs as _isect_cluster,
                )
            elif getattr(config, "cluster_walk", False):
                from kdtreepathtraceroptimization_tpu.ops.walk import (
                    intersect_mesh_walk as _isect_cluster,
                )
            elif getattr(config, "cluster_binned", False):
                from kdtreepathtraceroptimization_tpu.ops.binned import (
                    intersect_mesh_binned as _isect_cluster,
                )
            else:
                from kdtreepathtraceroptimization_tpu.ops.cluster import (
                    intersect_mesh_cluster as _isect_cluster,
                )

            tri_hit = _isect_cluster(origin, direction, cmesh, config,
                                     t_init=hit.t, active=active)
            mesh_hit = mesh_ops.tri_hit_to_hit(origin, direction, tri_hit,
                                               cmesh.tris)
        elif config.enable_kd and kd is not None:
            from kdtreepathtraceroptimization_tpu.ops.traverse import intersect_mesh_kd

            tri_hit = intersect_mesh_kd(origin, direction, kd, config,
                                        t_init=hit.t, active=active)
            mesh_hit = mesh_ops.tri_hit_to_hit(origin, direction, tri_hit, kd.tris)
        elif config.mxu_brute:
            from kdtreepathtraceroptimization_tpu.ops.mxu_bf import intersect_mesh_mxu

            tri_hit = intersect_mesh_mxu(origin, direction, mesh, t_max=hit.t)
            mesh_hit = mesh_ops.tri_hit_to_hit(origin, direction, tri_hit, mesh)
        else:
            tri_hit = mesh_ops.intersect_mesh_brute(
                origin, direction, mesh, use_bbox=config.use_bbox
            )
            mesh_hit = mesh_ops.tri_hit_to_hit(origin, direction, tri_hit, mesh)
        hit = isect._min_hit(hit, mesh_hit)
    return hit


def trace_iteration(
    geoms,
    materials,
    mesh,
    kd,
    camera,
    config: RenderConfig,
    base_key: jax.Array,
    iteration: jax.Array,
    cached_rays: "RaySoA" = None,
    cmesh=None,
) -> jax.Array:
    """One full path-trace iteration -> per-pixel radiance [N, 3].

    Equivalent of one pathtrace() call (reference: pathtrace.cu:2405-2635)
    minus the film accumulation, which the caller owns. ``cached_rays``
    reuses pre-generated camera rays (first-bounce ray caching, key C /
    dev_paths_cache, pathtrace.cu:2448-2456).
    """
    depth_budget = config.effective_depth
    if cached_rays is not None:
        rays = cached_rays
    else:
        raygen_k = bounce_key(base_key, iteration, 0)
        rays = generate_rays(camera, config, raygen_k, depth_budget)
    return trace_rays(rays, geoms, materials, mesh, kd, config,
                      base_key, iteration, cmesh=cmesh)


def trace_rays(
    rays: "RaySoA",
    geoms,
    materials,
    mesh,
    kd,
    config: RenderConfig,
    base_key: jax.Array,
    iteration: jax.Array,
    cmesh=None,
) -> jax.Array:
    """Trace an arbitrary wavefront through the bounce loop -> radiance.

    The ray-level entry under trace_iteration: used by the camera path
    and by auxiliary estimators that need radiance along hand-built rays
    (the edge-sampling boundary gradients, ops/edgegrad.py)."""
    n = rays.origin.x.shape[0]

    def bounce(carry, depth):
        rays: RaySoA = carry
        active = rays.remaining_bounces > 0

        hit = intersect_scene(
            rays.origin, rays.direction, geoms, materials, mesh, kd, config,
            active=active, cmesh=cmesh,
        )
        mat = bsdf.gather_materials(materials, hit.material_id)

        # Streams are keyed by PIXEL, not wavefront position: compaction
        # and material sort permute lanes, and a position-keyed stream
        # would make the image depend on the permutation (the reference
        # seeds per pixel index, pathtrace.cu:62-66).
        u = uniform_cols(bounce_key(base_key, iteration, depth + 1), n, 8,
                         lane=rays.pixel_index)

        scattered = bsdf.scatter(
            rays.origin,
            rays.direction,
            rays.is_inside,
            hit.point,
            hit.normal,
            mat,
            u,
            config.softness,
        )

        new_color, new_bounces = shade.shade(
            rays.color,
            rays.remaining_bounces,
            hit.t,
            mat,
            rays.sdepth,
            config.enable_sss,
        )

        keep = active & (hit.t < isect.BIG)
        new_rays = RaySoA(
            origin=vm.wherev(keep, scattered.origin, rays.origin),
            direction=vm.wherev(keep, scattered.direction, rays.direction),
            color=new_color,
            is_inside=jnp.where(keep, scattered.is_inside, rays.is_inside),
            sdepth=jnp.where(keep, scattered.sdepth, rays.sdepth),
            pixel_index=rays.pixel_index,
            remaining_bounces=new_bounces,
        )

        # Optional wavefront reorderings (reference: thrust remove_if /
        # sort, pathtrace.cu:2591-2606). On TPU these are locality
        # optimizations, not occupancy ones — lanes never shrink.
        if config.material_sort:
            from kdtreepathtraceroptimization_tpu.ops.compaction import (
                sort_rays_by_material,
            )

            new_rays, _ = sort_rays_by_material(new_rays, hit.material_id)
        elif config.compaction:
            from kdtreepathtraceroptimization_tpu.ops.compaction import compact_rays

            new_rays, _ = compact_rays(new_rays)
        return new_rays, None

    # Two bounce-loop forms (config.scan_bounces):
    # - lax.scan (default): compiles the bounce body — including any
    #   Pallas kernels — ONCE instead of depth times. On the tunneled
    #   compile service a depth-8 unroll of the cluster kernels takes
    #   ~10 min; the scan form compiles in ~1/8th of that. Reverse mode
    #   through scan is exact: the historical NaN-cotangent pathology
    #   died with the r5 channel-split rewrite (the old [N, G]
    #   masked-sum winner select emitted 0*inf in the scan transpose);
    #   test_grad_scan_equals_unroll pins scan-grad == unroll-grad.
    # - Python unroll: XLA fuses across bounce boundaries; compile cost
    #   grows superlinearly in depth. Depth is small and fixed (the
    #   reference caps at 8, pathtrace.cu:2608).
    if config.scan_bounces:
        rays, _ = jax.lax.scan(
            bounce, rays,
            jnp.arange(config.effective_depth, dtype=jnp.int32),
        )
    else:
        for depth in range(config.effective_depth):
            rays, _ = bounce(rays, jnp.int32(depth))

    # finalGather (reference: pathtrace.cu:2373-2383): every path adds its
    # accumulated color to its pixel. Without reordering pixel_index is
    # the identity and this is just the color array; with compaction or
    # material sort it is a scatter. ``partial_gather`` reproduces the
    # reference's compaction-mode gather (pathtrace.cu:2386-2399), which
    # drops paths still alive after the last bounce (see config.py).
    color = vm.v3_to_rows(rays.color)  # [N, 3] at the film boundary
    if config.partial_gather:
        color = jnp.where((rays.remaining_bounces == 0)[:, None], color, 0.0)
    if config.material_sort or config.compaction:
        n_px = color.shape[0]
        return jnp.zeros((n_px, 3), color.dtype).at[rays.pixel_index].set(color)
    return color


def _hoist_tables(*trees):
    """Split scene pytrees into (device-array args, rebuild fn).

    Large array leaves become jit ARGUMENTS (captured arrays embed as
    XLA constants, which the compiler ships to and constant-folds on the
    compile service — tens of MB and minutes of compile for a 100k-tri
    mesh). Non-array leaves (static ints like ClusterMesh.block or
    KDFlat.max_depth) stay in the closure so static uses keep working.

    SMALL numpy leaves (< 1024 elements: geom types/transforms/material
    rows) also stay in the closure as CONCRETE values: intersect_geoms
    emits one statically-typed test per geom (no traced-type double
    evaluation), and tiny tables constant-fold into the kernels. Camera
    fields were never hoisted for the same reason.
    """
    import numpy as _np

    leaves, treedef = jax.tree.flatten(trees)
    is_arr = [
        isinstance(l, jax.Array)
        or (isinstance(l, _np.ndarray) and l.size >= 1024)
        for l in leaves
    ]
    args = [jnp.asarray(l) for l, m in zip(leaves, is_arr) if m]

    def rebuild(args):
        it = iter(args)
        return jax.tree.unflatten(
            treedef, [next(it) if m else l for l, m in zip(leaves, is_arr)]
        )

    return args, rebuild


def make_render_fn(scene, config: RenderConfig, seed: int = 0):
    """Build a jitted ``(film, base_key, iteration) -> film`` step.

    ``film`` is the accumulated radiance sum [N, 3]; divide by the
    iteration count for display (reference: sendImageToPBO / saveImage,
    pathtrace.cu:69-89, main.cpp:1087-1108).

    ``seed`` matters only with ``config.ray_cache``: the cached camera
    rays are generated once at closure-build time from
    ``PRNGKey(seed)`` (the reference's iteration-1 cache,
    pathtrace.cu:2448-2456), so pass the same seed you will derive
    ``base_key`` from.
    """

    geoms, materials, mesh, kd, camera = (
        scene.geoms,
        scene.materials,
        scene.mesh,
        scene.kd,
        scene.camera,
    )
    cmesh = getattr(scene, "cmesh", None)
    tables, rebuild = _hoist_tables(geoms, materials, mesh, kd, cmesh)

    if config.ray_cache:
        # First-bounce ray caching (key C, pathtrace.cu:2448-2456):
        # camera rays are generated once — at iteration 1, from the
        # caller's seed — and reused every iteration (including their
        # AA jitter: the reference memcpy's the cached segments
        # verbatim each iteration too).
        from kdtreepathtraceroptimization_tpu.ops.rng import bounce_key as _bk

        cached = jax.jit(
            lambda k: generate_rays(camera, config, k, config.effective_depth)
        )(_bk(jax.random.PRNGKey(seed), 1, 0))

        @functools.partial(jax.jit, donate_argnums=(0,))
        def _step(film, base_key, iteration, tables, cached):
            geoms, materials, mesh, kd, cmesh = rebuild(tables)
            radiance = trace_iteration(
                geoms, materials, mesh, kd, camera, config, base_key, iteration,
                cached_rays=cached, cmesh=cmesh,
            )
            return film + radiance

        return lambda film, base_key, iteration: _step(
            film, base_key, iteration, tables, cached
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _step(film, base_key, iteration, tables):
        geoms, materials, mesh, kd, cmesh = rebuild(tables)
        radiance = trace_iteration(
            geoms, materials, mesh, kd, camera, config, base_key, iteration,
            cmesh=cmesh,
        )
        return film + radiance

    return lambda film, base_key, iteration: _step(
        film, base_key, iteration, tables
    )


def make_render_block_fn(scene, config: RenderConfig, block: int):
    """Build a jitted ``(film, base_key, start_iter) -> film`` step that
    runs ``block`` iterations inside ONE executable (lax.fori_loop over
    iterations, bounces unrolled in the body).

    On a remote/tunneled device every dispatch costs a round trip
    (~50 ms measured on the axon tunnel); chaining iterations
    on-device amortizes it to nothing. Compile cost is the same as the
    single-iteration step — the loop is dynamic.
    """
    geoms, materials, mesh, kd, camera = (
        scene.geoms, scene.materials, scene.mesh, scene.kd, scene.camera,
    )
    cmesh = getattr(scene, "cmesh", None)
    tables, rebuild = _hoist_tables(geoms, materials, mesh, kd, cmesh)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _block(film, base_key, start_iter, tables):
        geoms, materials, mesh, kd, cmesh = rebuild(tables)

        def body(i, f):
            radiance = trace_iteration(
                geoms, materials, mesh, kd, camera, config, base_key,
                start_iter + i, cmesh=cmesh,
            )
            return f + radiance

        return jax.lax.fori_loop(0, block, body, film)

    return lambda film, base_key, start_iter: _block(
        film, base_key, start_iter, tables
    )


def render(scene, config: RenderConfig, spp: int, seed: int = 0) -> jax.Array:
    """Render ``spp`` iterations and return the averaged image [H, W, 3]."""
    res_x = int(scene.camera.resolution[0])
    res_y = int(scene.camera.resolution[1])
    n = res_x * res_y
    film = jnp.zeros((n, 3), jnp.float32)
    key = jax.random.PRNGKey(seed)
    step = make_render_fn(scene, config, seed=seed)
    for it in range(1, spp + 1):
        film = step(film, key, jnp.int32(it))
    img = film / spp
    return img.reshape(res_y, res_x, 3)
