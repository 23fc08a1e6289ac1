"""Back-compat shim: procedural meshes moved into the package."""

from kdtreepathtraceroptimization_tpu.utils.procmesh import icosphere, write_obj  # noqa: F401
