"""Vector math on ``[..., 3]`` jnp arrays — the glm replacement.

The reference uses glm vec3/mat4 scalar math inside CUDA threads
(reference: external/include/glm, src/utilities.cpp:65-72). Here every
helper is batched over a leading ray axis so the VPU sees dense
``[N, 3]`` work, and everything is differentiable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = 1e-5  # reference: utilities.h EPSILON
BIG = 1e38


# ---------------------------------------------------------------------------
# Channel-split vectors: the TPU-fast representation.
#
# A [N, 3] array tiles as T(4,128) — 3 of 4 sublanes used — and every
# mask[:, None] broadcast against it is a cross-sublane op. Measured on
# v5e: the same shading math costs 3.9 ms on [N, 3] SoA vs 0.41 ms on
# three independent [N] arrays (exp/nomesh_stages.py, r5). The whole
# wavefront hot path therefore carries vectors as V3 = (x, y, z) of [N]
# arrays; [N, 3] appears only at module boundaries (film, intersector
# tables, public APIs).
# ---------------------------------------------------------------------------


class V3(NamedTuple):
    """Channel-split 3-vector batch: three same-shaped arrays."""

    x: jax.Array
    y: jax.Array
    z: jax.Array

    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __mul__(self, o):
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)


def v3_from_rows(a) -> V3:
    """[..., 3] array -> V3 of [...] channels."""
    return V3(a[..., 0], a[..., 1], a[..., 2])


def v3_to_rows(v: V3):
    """V3 -> [..., 3] array (module-boundary conversion)."""
    return jnp.stack([v.x, v.y, v.z], axis=-1)


def v3_splat(vec3, like=None) -> V3:
    """A length-3 constant/array -> V3 of scalars (broadcast later)."""
    a = jnp.asarray(vec3)
    return V3(a[..., 0], a[..., 1], a[..., 2])


def as_rows(x):
    """Accept V3 or [..., 3] rows; return [..., 3] rows (intersector
    boundary guard — triangle kernels are row-oriented)."""
    return v3_to_rows(x) if isinstance(x, V3) else x


def v3_zeros(n, dtype=jnp.float32) -> V3:
    z = jnp.zeros((n,), dtype)
    return V3(z, z, z)


def dotv(a: V3, b: V3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def crossv(a: V3, b: V3) -> V3:
    return V3(
        a.y * b.z - a.z * b.y,
        a.z * b.x - a.x * b.z,
        a.x * b.y - a.y * b.x,
    )


def normv(a: V3):
    return jnp.sqrt(dotv(a, a))


def safe_normv(a: V3, eps: float = 1e-12):
    return jnp.sqrt(dotv(a, a) + eps)


def normalizev(a: V3, eps: float = 1e-12) -> V3:
    # sqrt + per-channel divide, NOT rsqrt: rsqrt's approximate rounding
    # perturbs ray directions enough to chaotically diverge Monte-Carlo
    # paths from the committed goldens (bit-compatibility with the
    # row-form `normalize` matters more than one divide).
    n = jnp.sqrt(jnp.maximum(dotv(a, a), eps))
    return V3(a.x / n, a.y / n, a.z / n)


def wherev(cond, a: V3, b: V3) -> V3:
    return V3(
        jnp.where(cond, a.x, b.x),
        jnp.where(cond, a.y, b.y),
        jnp.where(cond, a.z, b.z),
    )


def reflectv(incident: V3, n: V3) -> V3:
    d = dotv(n, incident)
    return incident - n * (2.0 * d)


def refractv(incident: V3, n: V3, eta) -> V3:
    """glm::refract: zero vector on total internal reflection."""
    cosi = dotv(n, incident)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    tir = k < 0.0
    k_safe = jnp.maximum(k, 1e-12)  # sqrt' at 0 leaks NaN cotangents
    out = incident * eta - n * (eta * cosi + jnp.sqrt(k_safe))
    zero = jnp.zeros_like(out.x)
    return wherev(tir, V3(zero, zero, zero), out)


def rotate_about_axisv(v: V3, axis: V3, angle) -> V3:
    """Rodrigues rotation (channel-split twin of rotate_about_axis).

    The last term multiplies in the row form's exact association —
    ``(axis * dot) * (1 - c)`` — so results stay bit-identical to the
    committed goldens (reassociating the product chaotically diverges
    Monte-Carlo paths)."""
    axis = normalizev(axis)
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    return v * c + crossv(axis, v) * s + axis * dotv(axis, v) * (1.0 - c)


def dot(a, b):
    """Batched dot product over the last axis, keepdims=False."""
    return jnp.sum(a * b, axis=-1)


def dot3(a, b):
    """Batched dot, keeping the trailing axis for broadcasting."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a, b):
    return jnp.cross(a, b)


def norm(a):
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def safe_norm(a, eps: float = 1e-12):
    """Norm with a well-defined gradient at 0 (|x| has a 0/0 cotangent
    there). Used wherever distances between possibly-coincident points
    are differentiated — e.g. t = |hit - origin| when a scattered ray
    re-hits its own surface at t~0."""
    return jnp.sqrt(jnp.sum(a * a, axis=-1) + eps)


def normalize(a, eps: float = 1e-12):
    """Safe normalize: returns a/|a| with a floor to avoid NaN on zeros."""
    n = jnp.sqrt(jnp.maximum(jnp.sum(a * a, axis=-1, keepdims=True), eps))
    return a / n


def reflect(incident, n):
    """glm::reflect: I - 2*dot(N,I)*N."""
    return incident - 2.0 * dot3(n, incident) * n


def refract(incident, n, eta):
    """glm::refract semantics: returns 0 vector on total internal reflection.

    incident and n must be normalized; eta = n1/n2.
    """
    eta = jnp.asarray(eta)
    if eta.ndim == incident.ndim - 1:
        eta = eta[..., None]
    cosi = dot3(n, incident)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    tir = k < 0.0
    # Floor strictly above 0: sqrt' is infinite at 0 and would leak NaN
    # cotangents at the exact TIR boundary.
    k_safe = jnp.maximum(k, 1e-12)
    out = eta * incident - (eta * cosi + jnp.sqrt(k_safe)) * n
    return jnp.where(tir, 0.0, out)


def rotate_about_axis(v, axis, angle):
    """Rodrigues rotation of ``v`` around (normalized) ``axis`` by ``angle``.

    Mirrors the reference's hand-rolled rotateVector (interactions.h:44-65),
    which is an expanded Rodrigues formula.
    """
    axis = normalize(axis)
    c = jnp.cos(angle)[..., None]
    s = jnp.sin(angle)[..., None]
    return v * c + cross(axis, v) * s + axis * dot3(axis, v) * (1.0 - c)


def quat_rotate(v, quat_axis, angle):
    """Rotate ``v`` by the quaternion (cos(a/2), axis*sin(a/2)).

    Mirrors the DoF rotation in the reference (pathtrace.cu:384-393) which
    builds a quaternion from a random axis + random angle.
    """
    return rotate_about_axis(v, quat_axis, angle)


def transform_point(mat, p):
    """Apply a [..., 4, 4] (or [4,4]) matrix to [..., 3] points (w=1).

    Written as broadcast-multiply-sum, NOT einsum: einsum lowers to a
    batched [.., 3, 3] dot_general that XLA cannot fuse with elementwise
    producers/consumers on TPU — the broadcast operands materialize to
    HBM ([N, G, 3, 3] per call; measured 3.3 TB of traffic per analytic
    iteration at 800x800). The elementwise form fuses completely.
    """
    r = mat[..., :3, :3]
    return jnp.sum(r * p[..., None, :], axis=-1) + mat[..., :3, 3]


def transform_vector(mat, v):
    """Apply a [..., 4, 4] matrix to [..., 3] direction vectors (w=0).
    Elementwise form for fusion — see transform_point."""
    return jnp.sum(mat[..., :3, :3] * v[..., None, :], axis=-1)


# --------------------------------------------------------------------------
# Host-side (numpy) transform construction — reference: utilities.cpp:65-72
# --------------------------------------------------------------------------


def _rot_x(deg: float) -> np.ndarray:
    r = np.deg2rad(deg)
    c, s = np.cos(r), np.sin(r)
    return np.array([[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]], np.float64)


def _rot_y(deg: float) -> np.ndarray:
    r = np.deg2rad(deg)
    c, s = np.cos(r), np.sin(r)
    return np.array([[c, 0, s, 0], [0, 1, 0, 0], [-s, 0, c, 0], [0, 0, 0, 1]], np.float64)


def _rot_z(deg: float) -> np.ndarray:
    r = np.deg2rad(deg)
    c, s = np.cos(r), np.sin(r)
    return np.array([[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float64)


def build_transformation_matrix(translation, rotation_deg, scale) -> np.ndarray:
    """T @ Rx @ Ry @ Rz @ S, matching utilityCore::buildTransformationMatrix
    (reference: utilities.cpp:65-72)."""
    t = np.eye(4)
    t[:3, 3] = translation
    s = np.diag([scale[0], scale[1], scale[2], 1.0])
    r = _rot_x(rotation_deg[0]) @ _rot_y(rotation_deg[1]) @ _rot_z(rotation_deg[2])
    return (t @ r @ s).astype(np.float32)


def nondiff_call(fn, *args):
    """Invoke ``fn(*args)`` as an explicitly NON-differentiable block
    (zero/symbolic-zero tangents). Pallas kernels have no JVP rule, and
    even though every intersector output is stop_gradient'd, reverse
    mode must LINEARIZE any kernel sitting inside differentiated
    control flow (lax.cond/while) — which fails on TPU. All kernel
    outputs here are discrete selections whose gradients are recovered
    downstream by exact re-evaluation of the winner
    (mesh.refine_tri_hit), so zero tangents are semantically correct.
    """
    import jax.custom_derivatives as _cd

    f = jax.custom_jvp(fn)

    @f.defjvp
    def _jvp(primals, tangents):
        out = fn(*primals)
        return out, jax.tree.map(
            lambda pr: _cd.zero_from_primal(pr, symbolic_zeros=False), out
        )

    return f(*args)
