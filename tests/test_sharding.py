"""Multi-device sharding tests on the 8-virtual-CPU-device mesh
(SURVEY.md §4: multi-host testing via xla_force_host_platform_device_count)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.parallel.sharding import (
    device_film,
    make_mesh,
    make_sharded_render_fn,
    ray_sharding,
)
from kdtreepathtraceroptimization_tpu.render.integrator import make_render_fn
from kdtreepathtraceroptimization_tpu.scene.parser import with_resolution


@pytest.fixture(scope="module")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices (see conftest XLA_FLAGS)")
    return devs[:8]


def test_sharded_render_matches_single_device(cornell_scene, eight_devices):
    scene = with_resolution(cornell_scene, 32, 32)  # 1024 px / 8 devs
    cfg = RenderConfig(trace_depth=3)
    mesh = make_mesh(eight_devices)
    n = 32 * 32

    sharded_step = make_sharded_render_fn(scene, cfg, mesh)
    film_s = device_film(n, mesh)
    film_s = sharded_step(film_s, jax.random.PRNGKey(0), jnp.int32(1))

    single_step = make_render_fn(scene, cfg)
    film_1 = single_step(jnp.zeros((n, 3), jnp.float32), jax.random.PRNGKey(0), jnp.int32(1))

    np.testing.assert_allclose(
        np.asarray(film_s), np.asarray(film_1), rtol=1e-5, atol=1e-6
    )
    # the film really is sharded along the pixel axis
    assert film_s.sharding.spec == ray_sharding(mesh).spec


def test_sharded_train_step_runs(cornell_scene, eight_devices):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from kdtreepathtraceroptimization_tpu.models.inverse import make_train_step

    scene = with_resolution(cornell_scene, 32, 32)
    cfg = RenderConfig(trace_depth=2)
    mesh = make_mesh(eight_devices)
    n = 32 * 32

    target = jax.device_put(
        jnp.zeros((n, 3), jnp.float32), NamedSharding(mesh, P("rays"))
    )
    init_state, train_step = make_train_step(scene, cfg, target)
    state = jax.device_put(init_state(), NamedSharding(mesh, P()))
    state, loss = train_step(state, jax.random.PRNGKey(0), jnp.int32(1))
    assert np.isfinite(float(loss))
    # materials stay replicated after the update
    assert state.materials.color.sharding.is_fully_replicated


def test_dryrun_multichip_entrypoint(eight_devices):
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_entry_compiles():
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry2", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    out = compiled(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_render_distributed_single_process(cornell_scene, eight_devices):
    """The multihost entry degrades gracefully to one process: the
    sharded render over 8 virtual devices matches the plain render."""
    from kdtreepathtraceroptimization_tpu.parallel import multihost
    from kdtreepathtraceroptimization_tpu.render.integrator import render

    scene = with_resolution(cornell_scene, 32, 32)
    config = RenderConfig(trace_depth=2)
    assert multihost.initialize() is False  # no coordinator configured
    img = np.asarray(multihost.render_distributed(scene, config, spp=2))
    ref = np.asarray(render(scene, config, spp=2, seed=0))
    np.testing.assert_allclose(img, ref, rtol=1e-5, atol=1e-6)
