"""Scene data model: struct-of-arrays pytrees.

The reference models the scene as arrays-of-structs uploaded to the GPU
(`Geom`, `Material`, `Camera`, `PathSegment`, `ShadeableIntersection` —
reference: src/sceneStructs.h:15-85). On TPU the idiomatic layout is
struct-of-arrays: each field is one contiguous ``[N, ...]`` jnp array so the
VPU processes 8x128 lanes of one field at a time and XLA can fuse freely.

Every container here is a NamedTuple, hence automatically a JAX pytree:
it can cross ``jit`` boundaries, be donated, sharded, and differentiated.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

# Geometry type enum (reference: sceneStructs.h GeomType)
GEOM_SPHERE = 0
GEOM_CUBE = 1


class Camera(NamedTuple):
    """Pinhole camera (reference: sceneStructs.h Camera, scene.cpp:175-234).

    All fields are small arrays/scalars; the whole tuple is replicated on
    every chip. ``pixel_length`` is the world-space size of one pixel at
    unit distance (scene.cpp:222-224).
    """

    resolution: np.ndarray  # [2] int32 (x, y)
    position: np.ndarray  # [3] f32
    look_at: np.ndarray  # [3] f32
    view: np.ndarray  # [3] f32, normalized look direction
    up: np.ndarray  # [3] f32
    right: np.ndarray  # [3] f32
    fov: np.ndarray  # [2] f32 degrees (x, y)
    pixel_length: np.ndarray  # [2] f32


class GeomSoA(NamedTuple):
    """Analytic geometry (cubes/spheres) as SoA.

    Reference keeps per-geom 4x4 transform, inverse, inverse-transpose
    (sceneStructs.h Geom; utilities.cpp buildTransformationMatrix). Same
    here, stacked along a leading geom axis.
    """

    type: np.ndarray  # [G] int32 (GEOM_SPHERE | GEOM_CUBE)
    material_id: np.ndarray  # [G] int32
    transform: np.ndarray  # [G, 4, 4] f32
    inverse_transform: np.ndarray  # [G, 4, 4] f32
    inv_transpose: np.ndarray  # [G, 4, 4] f32
    # Source TRS, kept like the reference's Geom (sceneStructs.h
    # translation/rotation/scale) — used by tooling (scene writer,
    # camera controller) and not by the render path. None when the
    # geoms were built from raw matrices.
    translation: np.ndarray = None  # [G, 3] f32
    rotation: np.ndarray = None  # [G, 3] f32 degrees
    scale: np.ndarray = None  # [G, 3] f32

    @property
    def count(self) -> int:
        return int(self.type.shape[0])


class MaterialSoA(NamedTuple):
    """Materials as SoA (reference: sceneStructs.h Material).

    This is the primary differentiable parameter block: gradients flow to
    ``color``, ``specular_color``, ``emittance``, ``transmittance``.
    """

    color: np.ndarray  # [M, 3] f32
    specular_exponent: np.ndarray  # [M] f32
    specular_color: np.ndarray  # [M, 3] f32
    has_reflective: np.ndarray  # [M] f32 (probability)
    has_refractive: np.ndarray  # [M] f32 (probability)
    index_of_refraction: np.ndarray  # [M] f32
    emittance: np.ndarray  # [M] f32
    transmittance: np.ndarray  # [M, 3] f32

    @property
    def count(self) -> int:
        return int(self.emittance.shape[0])


class MeshSoA(NamedTuple):
    """Triangle mesh flattened to SoA (reference: scene.cpp:620-712
    obj_verts/obj_norms/obj_polysidxflat flattening).

    ``v0/v1/v2`` are pre-gathered per-triangle vertex positions so the
    device never chases an index indirection; same for normals. Per-triangle
    material id is already offset into the global material table (the
    reference applies ``mtlIdx + material_size - 1`` at traversal time,
    pathtrace.cu:991 — we bake it in at load).
    """

    v0: np.ndarray  # [T, 3] f32
    v1: np.ndarray  # [T, 3] f32
    v2: np.ndarray  # [T, 3] f32
    n0: np.ndarray  # [T, 3] f32
    n1: np.ndarray  # [T, 3] f32
    n2: np.ndarray  # [T, 3] f32
    material_id: np.ndarray  # [T] int32 (global material table index)
    shape_id: np.ndarray  # [T] int32 (source OBJ shape)
    shape_bbox_min: np.ndarray  # [S, 3] f32 per-shape AABB (scene.cpp:692-711)
    shape_bbox_max: np.ndarray  # [S, 3] f32

    @property
    def count(self) -> int:
        return int(self.material_id.shape[0])


def concat_materials(a: "MaterialSoA", b: "MaterialSoA") -> "MaterialSoA":
    """Append OBJ materials after scene materials (the reference appends
    to the same vector at load, scene.cpp:816-820)."""
    return MaterialSoA(
        *(np.concatenate([np.asarray(x), np.asarray(y)], axis=0) for x, y in zip(a, b))
    )


class RenderState(NamedTuple):
    """Per-render bookkeeping (reference: sceneStructs.h RenderState)."""

    iterations: int
    trace_depth: int
    image_name: str


class SceneData(NamedTuple):
    """Everything loaded from a scene file + optional OBJ.

    ``mesh`` / ``kd`` are None for analytic-only scenes (cornell.txt).
    ``kd`` holds the flattened KD arrays (accel.flatten.KDFlat).
    """

    camera: Camera
    geoms: GeomSoA
    materials: MaterialSoA
    state: RenderState
    mesh: Optional[MeshSoA] = None
    kd: Optional["KDFlat"] = None  # noqa: F821 — accel.flatten.KDFlat
    cmesh: Optional["ClusterMesh"] = None  # noqa: F821 — ops.cluster
