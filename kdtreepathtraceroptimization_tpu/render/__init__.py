from kdtreepathtraceroptimization_tpu.render.integrator import (  # noqa: F401
    make_render_fn,
    trace_iteration,
)
from kdtreepathtraceroptimization_tpu.render.film import Film  # noqa: F401
