"""Film accumulation and checkpoint/resume round-trips.

The reference's only 'checkpoint' was pressing S mid-render
(SURVEY.md §5); the rebuild serializes (accum, iteration, seed)
explicitly — these tests pin the exactness of the round trip.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.render.film import (
    Film,
    load_checkpoint,
    save_checkpoint,
    tonemap_srgb_u8,
)
from kdtreepathtraceroptimization_tpu.render.integrator import make_render_fn
from kdtreepathtraceroptimization_tpu.scene.parser import load_scene, with_resolution


SCENE = os.path.join(os.path.dirname(__file__), "..", "scenes", "cornell.txt")


def _scene(res=32):
    return with_resolution(load_scene(SCENE), res, res)


def test_checkpoint_roundtrip_exact(tmp_path):
    """save -> load -> resume must produce bit-identical film to an
    uninterrupted render (film + iteration + seed fully determine the
    remaining iterations)."""
    scene = _scene()
    config = RenderConfig(trace_depth=4)
    n = 32 * 32
    seed = 7
    key = jax.random.PRNGKey(seed)
    step = make_render_fn(scene, config, seed=seed)

    # Uninterrupted: 4 iterations.
    film_a = jnp.zeros((n, 3), jnp.float32)
    for it in range(1, 5):
        film_a = step(film_a, key, jnp.int32(it))

    # Interrupted after 2, checkpointed, resumed.
    film_b = jnp.zeros((n, 3), jnp.float32)
    for it in range(1, 3):
        film_b = step(film_b, key, jnp.int32(it))
    ckpt = Film(accum=film_b, iteration=2, seed=seed)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, ckpt)

    loaded = load_checkpoint(path)
    assert loaded.iteration == 2 and loaded.seed == seed
    np.testing.assert_array_equal(np.asarray(loaded.accum), np.asarray(film_b))

    resumed = loaded.accum
    key2 = jax.random.PRNGKey(loaded.seed)
    step2 = make_render_fn(scene, config, seed=loaded.seed)
    for it in range(loaded.iteration + 1, 5):
        resumed = step2(resumed, key2, jnp.int32(it))

    np.testing.assert_array_equal(np.asarray(resumed), np.asarray(film_a))


def test_checkpoint_roundtrip_ray_cache_seed(tmp_path):
    """With ray_cache the cached camera rays come from the SEED — two
    different seeds must give different cached rays (the round-1 bug
    cached PRNGKey(0) rays regardless), and resume with the saved seed
    must reproduce the uninterrupted render exactly."""
    scene = _scene()
    config = RenderConfig(trace_depth=2, antialias=True, ray_cache=True)
    n = 32 * 32

    films = {}
    for seed in (0, 3):
        key = jax.random.PRNGKey(seed)
        step = make_render_fn(scene, config, seed=seed)
        film = jnp.zeros((n, 3), jnp.float32)
        for it in range(1, 3):
            film = step(film, key, jnp.int32(it))
        films[seed] = np.asarray(film)
    assert np.abs(films[0] - films[3]).max() > 0, (
        "ray_cache ignored the seed: different seeds gave identical rays"
    )

    # Round trip at seed 3.
    ckpt = Film(accum=jnp.asarray(films[3]), iteration=2, seed=3)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, ckpt)
    loaded = load_checkpoint(path)
    step = make_render_fn(scene, config, seed=loaded.seed)
    resumed = loaded.accum
    key = jax.random.PRNGKey(loaded.seed)
    for it in range(loaded.iteration + 1, 5):
        resumed = step(resumed, key, jnp.int32(it))

    straight = jnp.zeros((n, 3), jnp.float32)
    step_s = make_render_fn(scene, config, seed=3)
    key_s = jax.random.PRNGKey(3)
    for it in range(1, 5):
        straight = step_s(straight, key_s, jnp.int32(it))
    np.testing.assert_array_equal(np.asarray(resumed), np.asarray(straight))


def test_film_image_and_tonemap():
    f = Film(accum=jnp.full((4, 3), 2.0), iteration=4, seed=0)
    img = f.image(2, 2)
    np.testing.assert_allclose(img, 0.5)
    u8 = tonemap_srgb_u8(img)
    assert u8.dtype == np.uint8
    # clamp x255, no gamma (reference: pathtrace.cu:80-87)
    assert (u8 == 127).all() or (u8 == 128).all()
    over = tonemap_srgb_u8(np.full((2, 2, 3), 3.0))
    assert (over == 255).all()
