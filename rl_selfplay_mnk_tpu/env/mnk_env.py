"""Vectorized MNK game engine as pure functions over an explicit state pytree.

Capability parity with the reference's ``TorchVectorMnkEnv``
(src/env/torch_vector_mnk_env.py:7-119), re-designed TPU-first:

  * State is an immutable ``EnvState`` pytree threaded through pure
    functions, never mutated in place.
  * ``step_subset(actions, active_indices)`` (reference :60-84) becomes
    ``step(cfg, state, actions, active)`` with a dense boolean ``active``
    mask: every shape is static, so the whole thing jits/vmaps/shards.
  * Stone placement is a dense one-hot outer-product add — no scatter with
    data-dependent indices (reference :68 uses advanced indexing).
  * Win detection is an MXU matmul against a precomputed line-incidence
    matrix (see ``lines.py``) instead of four conv2d calls (reference
    :106-119).
  * The reference's intended-but-unwired illegal-move validation
    (:86-104; its own test DID NOT RAISE) is provided as an opt-in pure
    check, ``validate_step_inputs`` — default-off to match the reference's
    actual runtime behavior.

Observation contract (reference :46-53): ``observation`` is the raw
(E, 2, M, N) float32 plane stack (channel 0 = black, channel 1 = white);
``action_mask`` is True on empty cells, flattened to (E, M*N).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .constants import PLAYER_BLACK
from .lines import line_matrix


class EnvConfig(NamedTuple):
    """Static board geometry. Hashable so it can close over jitted fns.

    ``use_pallas`` routes ``step`` through the fused Pallas kernel
    (ops/pallas_env.py) instead of the XLA op graph — bit-identical
    results, single-kernel execution.
    """

    m: int
    n: int
    k: int
    use_pallas: bool = False

    @property
    def num_actions(self) -> int:
        return self.m * self.n

    def validate(self) -> "EnvConfig":
        if not (self.m >= self.k and self.n >= self.k):
            raise AssertionError(
                f"Board ({self.m}x{self.n}) is too small for k={self.k}"
            )
        return self


class EnvState(NamedTuple):
    """Per-env game state, batched over the leading E axis.

    boards:         (E, 2, M, N) float32 — 1.0 where a stone of that color sits
    current_player: (E,)         int32   — 0 black, 1 white (mover)
    move_count:     (E,)         int32
    """

    boards: jax.Array
    current_player: jax.Array
    move_count: jax.Array

    @property
    def num_envs(self) -> int:
        return self.boards.shape[0]


def make_env_state(cfg: EnvConfig, num_envs: int) -> EnvState:
    """Fresh all-zero state; black to move (reference reset, :34-44)."""
    return EnvState(
        boards=jnp.zeros((num_envs, 2, cfg.m, cfg.n), dtype=jnp.float32),
        current_player=jnp.zeros((num_envs,), dtype=jnp.int32),
        move_count=jnp.zeros((num_envs,), dtype=jnp.int32),
    )


def reset_where(state: EnvState, mask: jax.Array) -> EnvState:
    """Reset the envs selected by the boolean ``mask`` (dense partial reset).

    Equivalent to the reference's ``reset(env_indices)`` (:39-42) but with a
    static-shape mask instead of an index list.
    """
    keep = ~mask
    return EnvState(
        boards=state.boards * keep[:, None, None, None].astype(state.boards.dtype),
        current_player=jnp.where(mask, PLAYER_BLACK, state.current_player),
        move_count=jnp.where(mask, 0, state.move_count),
    )


def action_mask(state: EnvState) -> jax.Array:
    """(E, M*N) bool — True on empty cells (reference observe, :46-49)."""
    e = state.boards.shape[0]
    occupied = (state.boards != 0.0).any(axis=1)
    return ~occupied.reshape(e, -1)


def observe(state: EnvState) -> dict:
    """Observation dict matching the reference contract (:46-53)."""
    return {"observation": state.boards, "action_mask": action_mask(state)}


def check_wins(cfg: EnvConfig, plane_flat: jax.Array) -> jax.Array:
    """True per row of ``plane_flat`` (E, M*N) iff it contains K in a row.

    counts[e, l] = number of the row's stones on line l; a win is any line
    fully occupied. One MXU matmul; the >= threshold and the any-reduction
    fuse into its epilogue.
    """
    lines = jnp.asarray(line_matrix(cfg.m, cfg.n, cfg.k))
    counts = jnp.dot(plane_flat, lines, preferred_element_type=jnp.float32)
    return (counts > cfg.k - 0.5).any(axis=-1)


def step(
    cfg: EnvConfig,
    state: EnvState,
    actions: jax.Array,
    active: Optional[jax.Array] = None,
):
    """Advance the selected envs by one move.

    Args:
        cfg: board geometry.
        state: current batched state.
        actions: (E,) int32 flat cell indices; ignored where ``active`` is
            False.
        active: (E,) bool — which envs actually move. None = all

    Returns:
        (new_state, rewards, dones):
            rewards: (E,) float32 — +1.0 to the mover on a win, else 0
                (reference :75-77). Loss/draw attribution is the self-play
                wrapper's job.
            dones: (E,) bool — win or draw this move (reference :71-73).

    Mover's player index toggles only on active envs (reference :82).
    """
    e = state.boards.shape[0]
    mn = cfg.num_actions
    if active is None:
        active = jnp.ones((e,), dtype=bool)

    if cfg.use_pallas:
        from ..ops.pallas_env import fused_step  # lazy: avoids import cycle

        interpret = jax.default_backend() == "cpu"
        new_state, rewards, dones, _ = fused_step(
            cfg._replace(use_pallas=False),
            state,
            actions,
            active,
            interpret=interpret,
        )
        return new_state, rewards, dones

    active_f = active.astype(jnp.float32)

    # Dense stone placement: outer product of (action one-hot) x (player
    # one-hot), zeroed on inactive envs. Pure VPU work, no scatter.
    act_oh = jax.nn.one_hot(actions, mn, dtype=jnp.float32) * active_f[:, None]
    player_oh = jax.nn.one_hot(state.current_player, 2, dtype=jnp.float32)
    boards_flat = state.boards.reshape(e, 2, mn)
    boards_flat = boards_flat + player_oh[:, :, None] * act_oh[:, None, :]

    move_count = state.move_count + active.astype(jnp.int32)

    # Win check on the mover's plane (post-placement).
    mover_plane = (boards_flat * player_oh[:, :, None]).sum(axis=1)
    winners = check_wins(cfg, mover_plane) & active
    draws = (move_count >= mn) & ~winners & active
    dones = winners | draws

    rewards = winners.astype(jnp.float32)

    current_player = state.current_player ^ active.astype(jnp.int32)

    new_state = EnvState(
        boards=boards_flat.reshape(e, 2, cfg.m, cfg.n),
        current_player=current_player,
        move_count=move_count,
    )
    return new_state, rewards, dones


def validate_step_inputs(
    cfg: EnvConfig,
    state: EnvState,
    actions: jax.Array,
    active: Optional[jax.Array] = None,
):
    """Opt-in debug invariants: action bounds + cell-occupancy.

    The reference ships these checks but never wires them into ``step_subset``
    (src/env/torch_vector_mnk_env.py:86-104 — its own test
    ``test_env_illegal_move`` fails with DID NOT RAISE). Here they are a pure
    function returning boolean validity arrays, usable either eagerly
    (``.any()`` + raise on host) or under ``jax.experimental.checkify``.

    Returns:
        (out_of_bounds, occupied): two (E,) bool arrays, True = violation,
        always False on inactive envs.
    """
    e = state.boards.shape[0]
    if active is None:
        active = jnp.ones((e,), dtype=bool)
    mn = cfg.num_actions
    oob = ((actions < 0) | (actions >= mn)) & active
    safe_actions = jnp.clip(actions, 0, mn - 1)
    boards_any = (state.boards != 0.0).any(axis=1).reshape(e, mn)
    occ = jnp.take_along_axis(boards_any, safe_actions[:, None], axis=1)[:, 0]
    return oob, occ & active & ~oob
