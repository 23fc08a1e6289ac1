"""Film accumulation, tonemap, and checkpoint/resume.

The reference accumulates radiance into ``dev_image`` across iterations
and tonemaps on present (src/pathtrace.cu:69-89 sendImageToPBO: mean over
iterations, clamp to [0,1], x255) — pressing S mid-render was its only
"checkpoint" (SURVEY.md §5). Here the film is an explicit value:
(accumulator, iteration, rng key) — trivially serializable, so renders
can stop and resume exactly.
"""

from __future__ import annotations

import json
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Film(NamedTuple):
    accum: jax.Array  # [N, 3] radiance sum
    iteration: int
    seed: int

    @staticmethod
    def create(n_pixels: int, seed: int = 0) -> "Film":
        return Film(
            accum=jnp.zeros((n_pixels, 3), jnp.float32), iteration=0, seed=seed
        )

    def image(self, height: int, width: int) -> np.ndarray:
        """Averaged float image [H, W, 3] (reference: main.cpp:1092-1098
        divides by samples; no x-mirror needed — see ops/camera.py)."""
        it = max(self.iteration, 1)
        return np.asarray(self.accum).reshape(height, width, 3) / it


def tonemap_srgb_u8(img: np.ndarray) -> np.ndarray:
    """Clamp + 8-bit quantize (reference: pathtrace.cu:80-87 does
    clamp(mean*255) with no gamma; same here for parity)."""
    return np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)


def save_checkpoint(path: str, film: Film) -> None:
    """Serialize film + iteration + seed (SURVEY.md §5: the rebuild's
    checkpoint is film + RNG key + iteration count)."""
    np.savez(
        path,
        accum=np.asarray(film.accum),
        iteration=film.iteration,
        seed=film.seed,
    )


def load_checkpoint(path: str) -> Film:
    data = np.load(path)
    return Film(
        accum=jnp.asarray(data["accum"]),
        iteration=int(data["iteration"]),
        seed=int(data["seed"]),
    )
