from kdtreepathtraceroptimization_tpu.scene.structs import (  # noqa: F401
    Camera,
    GeomSoA,
    MaterialSoA,
    MeshSoA,
    RenderState,
    SceneData,
)
from kdtreepathtraceroptimization_tpu.scene.parser import load_scene  # noqa: F401
from kdtreepathtraceroptimization_tpu.scene.obj_loader import load_obj  # noqa: F401
