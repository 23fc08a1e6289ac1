import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.render.integrator import render
from kdtreepathtraceroptimization_tpu.tools.goldens import REFERENCE_CORNELL, REFERENCE_RENDER
from kdtreepathtraceroptimization_tpu.scene.parser import load_scene, with_resolution
from kdtreepathtraceroptimization_tpu.utils.image import read_png

ref = read_png(REFERENCE_RENDER).astype(np.float32) / 255.0
ref = ref.reshape(50, 16, 50, 16, 3).mean(axis=(1, 3))
for spp in (48, 192, 512):
    scene = with_resolution(load_scene(REFERENCE_CORNELL), 50, 50)
    img = np.asarray(render(scene, RenderConfig(trace_depth=8, antialias=True), spp=spp, seed=0))
    ours = np.clip(img, 0.0, 1.0)
    a, b = ours.mean(axis=2).ravel(), ref.mean(axis=2).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    print(f"spp={spp}: corr={corr:.4f} mad={np.abs(ours-ref).mean():.4f} our_mean={ours.mean():.3f} ref_mean={ref.mean():.3f}")
