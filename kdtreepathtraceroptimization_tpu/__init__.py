"""kdtreepathtraceroptimization_tpu — a TPU-native differentiable path tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
reddeupenn/kdtreePathTracerOptimization (a CUDA KD-tree path tracer):

- Wavefront (not megakernel) Monte-Carlo path tracing over SoA ray batches
  (reference: src/pathtrace.cu one-thread-per-path megakernels).
- KD-tree acceleration structure built on host, flattened to SoA arrays,
  traversed on-device with a vectorized short-stack `lax.while_loop`
  (reference: src/KDnode.cpp host build + pathtrace.cu:1023-1235 hybrid
  short-stack traversal).
- Diffuse / specular / refractive (Fresnel) / subsurface materials
  (reference: src/interactions.h:195-358 scatterRay).
- Antialiasing, depth of field, soft reflections, stream compaction,
  material sorting, first-bounce ray caching (reference: src/pathtrace.cu
  orchestrator, src/main.cpp key toggles).
- Differentiable w.r.t. materials and camera (new capability, absent in
  the reference).
- Multi-chip/multi-host scaling via `jax.sharding.Mesh` + `shard_map`
  (reference had no distributed capability; its data parallelism was
  CUDA-thread-per-ray).
"""

__version__ = "0.1.0"

from kdtreepathtraceroptimization_tpu.config import RenderConfig  # noqa: F401
from kdtreepathtraceroptimization_tpu.scene.structs import (  # noqa: F401
    Camera,
    GeomSoA,
    MaterialSoA,
    SceneData,
)
