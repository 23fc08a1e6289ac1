"""Inverse rendering — the framework's "model": differentiable render +
gradient-based material/camera optimization.

This is the flagship new capability over the reference (which is
forward-only CUDA): the whole wavefront integrator is differentiable
w.r.t. the material table (albedo, specular, emittance, transmittance),
so scene parameters can be fit to target images by gradient descent.
The "training step" is: render with current materials -> image loss vs
target -> grad -> optax update, with material gradients all-reduced
across the device mesh automatically by GSPMD (parallel/sharding.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

try:
    import optax
except Exception:  # pragma: no cover - optax is baked into the image
    optax = None

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.render.integrator import trace_iteration
from kdtreepathtraceroptimization_tpu.scene.structs import MaterialSoA


class TrainState(NamedTuple):
    materials: MaterialSoA
    opt_state: tuple
    step: jax.Array  # int32


def render_loss(
    materials: MaterialSoA,
    scene,
    config: RenderConfig,
    base_key: jax.Array,
    iteration: jax.Array,
    target: jax.Array,  # [N, 3]
) -> jax.Array:
    """MSE between a one-iteration render and the target radiance."""
    radiance = trace_iteration(
        scene.geoms,
        materials,
        scene.mesh,
        scene.kd,
        scene.camera,
        config,
        base_key,
        iteration,
        cmesh=getattr(scene, "cmesh", None),
    )
    return jnp.mean((radiance - target) ** 2)


def make_train_step(scene, config: RenderConfig, target: jax.Array,
                    learning_rate: float = 5e-3):
    """Build (init_state, jitted step(state, key, iteration) -> (state, loss)).

    Under a device mesh, ``target`` should be sharded like the film and
    the materials replicated; GSPMD then all-reduces the material grads
    (the psum-over-ICI of SURVEY.md §2.7).
    """
    if optax is None:
        raise RuntimeError("optax unavailable")
    tx = optax.adam(learning_rate)

    def init_state() -> TrainState:
        materials = jax.tree.map(jnp.asarray, scene.materials)
        return TrainState(
            materials=materials,
            opt_state=tx.init(materials),
            step=jnp.int32(0),
        )

    @jax.jit
    def train_step(state: TrainState, base_key, iteration) -> Tuple[TrainState, jax.Array]:
        loss, grads = jax.value_and_grad(render_loss)(
            state.materials, scene, config, base_key, iteration, target
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.materials)
        materials = optax.apply_updates(state.materials, updates)
        # Physical clamps: albedo/specular in [0, 1], emittance >= 0.
        materials = materials._replace(
            color=jnp.clip(materials.color, 0.0, 1.0),
            specular_color=jnp.clip(materials.specular_color, 0.0, 1.0),
            emittance=jnp.maximum(materials.emittance, 0.0),
            transmittance=jnp.clip(materials.transmittance, 0.0, 1.0),
        )
        return (
            TrainState(materials=materials, opt_state=opt_state, step=state.step + 1),
            loss,
        )

    return init_state, train_step
