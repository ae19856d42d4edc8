"""TPU-native self-play PPO framework for MNK games.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``michal-szadkowski/rl-selfplay-mnk`` (reference: ``/root/reference``).

Design stance (vs. the PyTorch reference):
  * All mutable object state (env boards, self-play bookkeeping, PPO buffers,
    opponent pool) is an explicit pytree threaded through pure functions
    under ``jax.jit``.
  * Data-dependent boolean indexing in the reference
    (``step_subset(actions, active_indices)``) becomes dense masked
    computation with static shapes.
  * K-in-a-row win detection is an MXU matmul against a precomputed
    line-incidence matrix rather than a translation of the reference's
    ``F.conv2d`` kernels (reference: src/env/torch_vector_mnk_env.py:106-119).
  * The per-iteration rollout/update loops are single ``lax.scan`` programs.
  * Scaling is a ``jax.sharding.Mesh`` with an ``env`` data axis; envs and
    rollouts shard over chips, gradients reduce via XLA collectives.
"""

__version__ = "0.1.0"
