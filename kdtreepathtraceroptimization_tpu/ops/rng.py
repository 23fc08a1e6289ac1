"""Counter-based RNG for the wavefront path tracer.

The reference seeds a per-thread thrust RNG with
``hash((1<<31) | (depth<<22) | iter) ^ hash(index)``
(reference: pathtrace.cu:62-66, intersections.h:15-23). The TPU-native
equivalent is JAX's counter-based threefry: we fold (iteration, depth)
into a base key and draw whole ``[N, k]`` blocks of uniforms at once —
statistically equivalent (iid per (iter, pixel, depth)), deterministic
under a fixed base key, and reproducible across shardings because the
block is drawn along the ray axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bounce_key(base_key: jax.Array, iteration, depth) -> jax.Array:
    """Key for one (iteration, bounce) pair — mirrors makeSeededRandomEngine's
    (iter, depth) dependence; the pixel index becomes the array axis.

    ``depth`` convention: 0 = camera-ray generation, 1.. = bounce index
    (fold_in requires non-negative values).
    """
    k = jax.random.fold_in(base_key, jnp.uint32(iteration))
    return jax.random.fold_in(k, jnp.uint32(depth))


def uniforms(key: jax.Array, n_rays: int, n_samples: int) -> jax.Array:
    """Draw a ``[n_rays, n_samples]`` block of U(0,1) samples."""
    return jax.random.uniform(key, (n_rays, n_samples), dtype=jnp.float32)
