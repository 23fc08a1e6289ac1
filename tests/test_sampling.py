"""Statistical tests for sampling primitives (reference: interactions.h)."""

import jax
import jax.numpy as jnp
import numpy as np

from kdtreepathtraceroptimization_tpu.ops import sampling, vecmath as vm


def test_cosine_hemisphere_distribution():
    key = jax.random.PRNGKey(0)
    n = 20000
    u = jax.random.uniform(key, (n, 2))
    normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    d = sampling.cosine_hemisphere(normal, u[:, 0], u[:, 1])
    d = np.asarray(d)
    lens = np.linalg.norm(d, axis=1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-4)
    assert (d[:, 2] >= -1e-6).all()  # all in upper hemisphere
    # E[cos theta] = 2/3 for cosine-weighted
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 0.01


def test_cosine_hemisphere_tilted_normal():
    key = jax.random.PRNGKey(1)
    n = 5000
    u = jax.random.uniform(key, (n, 2))
    nrm = vm.normalize(jnp.tile(jnp.asarray([[1.0, 1.0, 1.0]]), (n, 1)))
    d = np.asarray(sampling.cosine_hemisphere(nrm, u[:, 0], u[:, 1]))
    cos = (d * np.asarray(nrm)).sum(axis=1)
    assert (cos >= -1e-5).all()


def test_uniform_sphere_mean_zero():
    key = jax.random.PRNGKey(2)
    n = 20000
    u = jax.random.uniform(key, (n, 2))
    d = np.asarray(sampling.uniform_sphere(u[:, 0], u[:, 1]))
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-4)
    assert np.abs(d.mean(axis=0)).max() < 0.02


def test_rotate_cone_sample_aligns():
    # a sample exactly at -z must map onto the target direction
    v = jnp.asarray([[0.0, 0.0, -1.0]] * 4)
    dirs = vm.normalize(
        jnp.asarray([[1.0, 0, 0], [0, 1, 0], [0.5, -0.5, 0.7], [0, 0, -1.0]])
    )
    out = np.asarray(sampling.rotate_cone_sample(dirs, v))
    np.testing.assert_allclose(out, np.asarray(dirs), atol=1e-5)


def test_schlick_fresnel_range():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    i = vm.normalize(jnp.asarray([[0.0, 0.5, -1.0]]))
    f = sampling.schlick_fresnel(i, n, jnp.asarray([1.5]))
    assert 0.0 <= float(f[0]) <= 1.0
    # grazing incidence -> F approaches 1
    i_graze = vm.normalize(jnp.asarray([[0.0, 0.999, -0.045]]))
    f_graze = sampling.schlick_fresnel(i_graze, n, jnp.asarray([1.5]))
    assert float(f_graze[0]) > 0.8


def test_reflect_refract():
    i = vm.normalize(jnp.asarray([[1.0, 0.0, -1.0]]))
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    r = np.asarray(vm.reflect(i, n))
    np.testing.assert_allclose(r[0], [2**-0.5, 0, 2**-0.5], atol=1e-6)
    # refraction into denser medium bends toward normal
    t = np.asarray(vm.refract(i, n, jnp.asarray([1 / 1.5])))
    assert t[0, 2] < 0
    assert abs(t[0, 0]) < abs(i[0, 0])
    # TIR returns zero vector (glm semantics)
    i2 = vm.normalize(jnp.asarray([[0.999, 0.0, -0.045]]))
    t2 = np.asarray(vm.refract(i2, n, jnp.asarray([1.5])))
    np.testing.assert_allclose(t2[0], [0, 0, 0], atol=1e-6)
