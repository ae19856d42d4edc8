"""Device mesh + sharding layout for multi-chip / multi-host scaling.

The reference is strictly single-process single-GPU (SURVEY.md §2.3: no
distributed components whatsoever); its only parallelism is the env batch
axis. The TPU-native scaling design promotes exactly that axis to a mesh
dimension:

  * 1-D mesh over all chips with axis name "env".
  * Env state / rollout trajectories: sharded on the leading env axis —
    every wrapper/rollout op is batch-parallel, zero communication.
  * Network params / optimizer state: replicated; minibatch gradients are
    data-parallel, XLA inserts the psum over ICI during the jitted update.
  * Opponent snapshots and pool entries: replicated (broadcast once per
    iteration — the only cross-host traffic besides the gradient psum).

Everything goes through ``jax.jit`` with sharded inputs — XLA propagates
layouts through scan/while bodies, so the same programs run unmodified on
1 chip, an 8-device CPU test mesh, or a pod slice. Multi-host entry is
``init_distributed()`` (jax.distributed.initialize).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def make_mesh(num_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data mesh over the first ``num_devices`` (default: all)."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (ENV_AXIS,))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays with a leading env/batch axis."""
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batched(tree: Any, mesh: Mesh, batch_size: Optional[int] = None) -> Any:
    """Place every leaf with its leading axis sharded over the env axis.

    With ``batch_size`` given (the env count), exactly the leaves whose
    leading dimension equals it are sharded — deterministic placement.
    Without it, any leaf whose leading dimension divides the mesh size is
    sharded (convenient for homogeneous env-state pytrees, but a non-batch
    leaf with a coincidentally divisible dim0 would be sharded too — pass
    ``batch_size`` when the pytree mixes axes). Other leaves (scalars,
    tables) are replicated.
    """
    n = mesh.devices.size
    es = env_sharding(mesh)
    rs = replicated_sharding(mesh)

    def is_batch(x) -> bool:
        if x.ndim < 1 or x.shape[0] == 0:
            return False
        if batch_size is not None:
            return x.shape[0] == batch_size and x.shape[0] % n == 0
        return x.shape[0] % n == 0

    def place(x):
        x = jax.numpy.asarray(x)
        return jax.device_put(x, es if is_batch(x) else rs)

    return jax.tree.map(place, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    rs = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(jax.numpy.asarray(x), rs), tree)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init (no-op when single-process).

    On TPU pods jax.distributed.initialize() autodetects everything from the
    environment; explicit args support manual / GPU-style bring-up.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
