"""ZeRO-style sharded optimizer over the env mesh axis (opt-in).

Closes the BASELINE.json north-star clause "envs sharded over hosts feeding
a SHARDED learner via psum/all_gather collectives". The replicated
data-parallel learner (parallel/mesh.py) psums gradients and keeps full
parameters + optimizer moments on every device; this wrapper shards the
optimizer step instead, the JAX/GSPMD way — no NCCL-style hand-written
collectives, just sharding constraints that make XLA emit them:

  * gradients are flattened to one (d, N/d) vector and CONSTRAINED to the
    env axis — the batch-parallel gradient psum becomes a reduce-scatter
    (each device receives only its 1/d slice of the summed gradient);
  * the inner optimizer (clip + AdamW) runs on the sharded flat vector —
    moments live sharded (2N/d per device instead of 2N) and the update
    math runs on N/d elements per device;
  * the resulting update vector is constrained back to replicated — an
    all-gather — and applied to the replicated parameters.

Communication per minibatch is an (reduce_scatter + all_gather) pair —
byte-identical to the all-reduce it replaces (an all-reduce IS
reduce-scatter + all-gather on ICI) — so this trades nothing on the wire
and saves 2N·(d-1)/d optimizer-state HBM per device plus (d-1)/d of the
optimizer-step FLOPs. At this framework's model scale (≤2.6M params, §2.2)
those savings are ~20 MB and microseconds — quantified in PERFORMANCE.md
"Sharded learner (ZeRO-1)" — so the wrapper is OPT-IN
(config "zero_sharded_optimizer"), with the replicated learner remaining
the measured default.

Global-norm clipping inside the inner chain is exact: optax's
clip_by_global_norm squares-and-sums the (d, N/d) sharded leaf, which XLA
lowers to a shard-local reduction + scalar psum.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import ENV_AXIS


class _FlatSpec(NamedTuple):
    """Static flatten/unflatten recipe for one parameter pytree layout."""

    treedef: Any
    shapes: tuple
    sizes: tuple
    dtypes: tuple
    n_devices: int
    padded: int  # total flat length incl. zero padding (multiple of d)


def _make_spec(params: Any, n_devices: int) -> _FlatSpec:
    leaves, treedef = jax.tree.flatten(params)
    shapes = tuple(l.shape for l in leaves)
    sizes = tuple(int(jnp.size(l)) for l in leaves)
    dtypes = tuple(l.dtype for l in leaves)
    total = sum(sizes)
    padded = -(-total // n_devices) * n_devices
    return _FlatSpec(treedef, shapes, sizes, dtypes, n_devices, padded)


def _flatten(spec: _FlatSpec, tree: Any) -> jax.Array:
    """Pytree -> (d, padded/d) f32 vector (zero-padded tail)."""
    leaves = jax.tree.leaves(tree)
    flat = jnp.concatenate(
        [l.astype(jnp.float32).ravel() for l in leaves]
    )
    flat = jnp.pad(flat, (0, spec.padded - flat.shape[0]))
    return flat.reshape(spec.n_devices, spec.padded // spec.n_devices)


def _unflatten(spec: _FlatSpec, flat: jax.Array) -> Any:
    vec = flat.reshape(-1)
    leaves = []
    off = 0
    for shape, size, dtype in zip(spec.shapes, spec.sizes, spec.dtypes):
        leaves.append(vec[off:off + size].reshape(shape).astype(dtype))
        off += size
    return jax.tree.unflatten(spec.treedef, leaves)


class ZeroShardedState(NamedTuple):
    inner: Any  # inner optimizer state over the (d, N/d) flat vector


def zero_sharded(
    inner: optax.GradientTransformation, mesh: Mesh
) -> optax.GradientTransformation:
    """Wrap ``inner`` so its state and step are sharded over ``mesh``'s env
    axis (ZeRO-1). Gradients in, updates out — a drop-in
    ``optax.GradientTransformation`` for the PPO update's ``mb_body``.

    The flatten spec is built lazily at ``init`` from the actual parameter
    pytree; ``update`` recovers it from the state's leaf shapes, so the
    transformation object stays hashable/static for jit.
    """
    shard = NamedSharding(mesh, P(ENV_AXIS))
    repl = NamedSharding(mesh, P())
    d = mesh.devices.size

    def init(params):
        spec = _make_spec(params, d)
        flat = jax.lax.with_sharding_constraint(
            _flatten(spec, params), shard
        )
        return ZeroShardedState(inner.init(flat))

    def update(grads, state, params=None):
        assert params is not None, "zero_sharded needs params (AdamW decay)"
        spec = _make_spec(params, d)
        # Batch-parallel grads arrive needing a sum over the env axis; the
        # sharded constraint turns that sum into a reduce-scatter.
        gflat = jax.lax.with_sharding_constraint(_flatten(spec, grads), shard)
        # Params are replicated: each device slices its rows locally (free).
        pflat = jax.lax.with_sharding_constraint(
            _flatten(spec, params), shard
        )
        upd, inner_state = inner.update(gflat, state.inner, pflat)
        # Moments keep the sharded layout across iterations.
        inner_state = jax.tree.map(
            lambda l: (
                jax.lax.with_sharding_constraint(l, shard)
                if getattr(l, "ndim", 0) == 2 and l.shape == gflat.shape
                else l
            ),
            inner_state,
        )
        # All-gather the update vector; apply_updates then runs replicated.
        upd = jax.lax.with_sharding_constraint(upd, repl)
        return _unflatten(spec, upd), ZeroShardedState(inner_state)

    return optax.GradientTransformation(init, update)
