"""Ambient sharding context for shard-local intersector internals.

GSPMD's propagation gives up inside the intersectors' while-loop
bodies (compaction sorts + along-axis gathers/scatters on the
[shards, n/shards] ray view) and inserts all-gathers. The sharded
render entry (parallel/sharding.make_sharded_render_fn) activates this
context while TRACING, and the intersectors pin their per-shard
intermediates with ``constrain`` — arrays whose leading axis equals
the mesh's device count get an explicit
``with_sharding_constraint(P(axis, None, ...))``, which keeps every
row-local op row-local. Outside the context (single-chip jit, CPU
tests, Pallas-only paths) ``constrain`` is an exact no-op.
"""

from __future__ import annotations

import contextlib
import contextvars

_CTX = contextvars.ContextVar("kdt_shard_ctx", default=None)


@contextlib.contextmanager
def active(mesh, axis: str):
    """Activate (mesh, axis) for the duration of a trace."""
    tok = _CTX.set((mesh, axis))
    try:
        yield
    finally:
        _CTX.reset(tok)


def constrain(arr):
    """Pin ``arr``'s leading axis to the active mesh axis (no-op when
    no context is active or the leading dim is not the shard count)."""
    ctx = _CTX.get()
    if ctx is None:
        return arr
    mesh, axis = ctx
    if arr.ndim == 0 or arr.shape[0] != mesh.shape[axis]:
        return arr
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(axis, *([None] * (arr.ndim - 1)))
    return jax.lax.with_sharding_constraint(arr, NamedSharding(mesh, spec))
