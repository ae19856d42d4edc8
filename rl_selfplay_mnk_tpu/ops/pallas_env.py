"""Pallas TPU kernel: fully fused MNK env step.

One kernel performs what the XLA path (env/mnk_env.py ``step`` + ``observe``)
expresses as ~a dozen ops: stone placement, K-in-a-row win detection (the
line-incidence matmul on the MXU), draw/done/reward computation, player
toggle, and the next action mask — all while the board tile stays resident
in VMEM. Grid is 1-D over env tiles.

The XLA path remains the default (it is already well fused for these sizes);
this kernel is the template for the deeper fused kernels (selfplay phase,
conv blocks) and is validated against the XLA path bit-for-bit in
``tests/test_pallas.py`` (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..env.lines import line_matrix
from ..env.mnk_env import EnvConfig, EnvState


def _step_kernel(
    k_thresh: float,
    mn: int,
    boards_ref,  # (TE, 2*MN) f32 in VMEM
    player_ref,  # (TE, 1) i32
    mc_ref,  # (TE, 1) i32
    actions_ref,  # (TE, 1) i32
    active_ref,  # (TE, 1) i32 (0/1)
    lines_ref,  # (MN, L) f32
    out_boards_ref,
    out_player_ref,
    out_mc_ref,
    out_rewards_ref,  # (TE, 1) f32
    out_dones_ref,  # (TE, 1) i32
    out_mask_ref,  # (TE, MN) i32 (0/1 legality)
):
    te = boards_ref.shape[0]
    boards = boards_ref[:]  # (TE, 2*MN)
    black = boards[:, :mn]
    white = boards[:, mn:]

    active = active_ref[:].astype(jnp.float32)  # (TE, 1)
    player = player_ref[:]  # (TE, 1) i32
    actions = actions_ref[:]  # (TE, 1)

    # Dense one-hot placement (VPU): cell == action, gated by active.
    cols = jax.lax.broadcasted_iota(jnp.int32, (te, mn), 1)
    onehot = (cols == actions).astype(jnp.float32) * active  # (TE, MN)
    is_black = (player == 0).astype(jnp.float32)  # (TE, 1)
    black = black + onehot * is_black
    white = white + onehot * (1.0 - is_black)

    move_count = mc_ref[:] + active_ref[:]

    # Mover plane + line occupancy counts on the MXU.
    mover = black * is_black + white * (1.0 - is_black)  # (TE, MN)
    counts = jnp.dot(mover, lines_ref[:], preferred_element_type=jnp.float32)
    winners_f = jnp.max(
        (counts > k_thresh).astype(jnp.float32), axis=1, keepdims=True
    )
    winners = winners_f * active  # (TE, 1) f32 0/1
    full = (move_count >= mn).astype(jnp.float32)
    draws = full * (1.0 - winners) * active
    dones = winners + draws  # disjoint

    out_boards_ref[:, :mn] = black
    out_boards_ref[:, mn:] = white
    out_player_ref[:] = player ^ active_ref[:]
    out_mc_ref[:] = move_count
    out_rewards_ref[:] = winners
    out_dones_ref[:] = dones.astype(jnp.int32)
    # Next action mask: empty cells (fused observe()).
    occupied = black + white
    out_mask_ref[:] = (occupied < 0.5).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("cfg", "tile_envs", "interpret")
)
def fused_step(
    cfg: EnvConfig,
    state: EnvState,
    actions: jax.Array,
    active: jax.Array | None = None,
    tile_envs: int = 512,
    interpret: bool = False,
):
    """Pallas-fused equivalent of ``env.step`` + next action mask.

    Returns (new_state, rewards, dones, action_mask) — identical to
    ``step(cfg, state, actions, active)`` plus ``action_mask(new_state)``.
    """
    e = state.boards.shape[0]
    mn = cfg.num_actions
    if active is None:
        active = jnp.ones((e,), bool)
    # Degrade the tile until it divides the env count (like the other
    # kernel entry points) instead of asserting — direct callers get the
    # same safe behavior the env.step wrapper implements.
    tile = min(tile_envs, e)
    while tile > 1 and e % tile:
        tile //= 2
    lines = jnp.asarray(line_matrix(cfg.m, cfg.n, cfg.k))
    nl = lines.shape[1]

    boards2d = state.boards.reshape(e, 2 * mn)
    grid = (e // tile,)

    def row_spec(width, dtype_rows=None):
        del dtype_rows
        return pl.BlockSpec((tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(_step_kernel, cfg.k - 0.5, mn)
    out_shapes = (
        jax.ShapeDtypeStruct((e, 2 * mn), jnp.float32),  # boards
        jax.ShapeDtypeStruct((e, 1), jnp.int32),  # player
        jax.ShapeDtypeStruct((e, 1), jnp.int32),  # move_count
        jax.ShapeDtypeStruct((e, 1), jnp.float32),  # rewards
        jax.ShapeDtypeStruct((e, 1), jnp.int32),  # dones
        jax.ShapeDtypeStruct((e, mn), jnp.int32),  # action mask
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec(2 * mn),
            row_spec(1),
            row_spec(1),
            row_spec(1),
            row_spec(1),
            pl.BlockSpec((mn, nl), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            row_spec(2 * mn),
            row_spec(1),
            row_spec(1),
            row_spec(1),
            row_spec(1),
            row_spec(mn),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(
        boards2d,
        state.current_player[:, None].astype(jnp.int32),
        state.move_count[:, None].astype(jnp.int32),
        actions[:, None].astype(jnp.int32),
        active[:, None].astype(jnp.int32),
        lines,
    )
    boards, player, mc, rewards, dones, mask = out
    new_state = EnvState(
        boards=boards.reshape(e, 2, cfg.m, cfg.n),
        current_player=player[:, 0],
        move_count=mc[:, 0],
    )
    return new_state, rewards[:, 0], dones[:, 0].astype(bool), mask.astype(bool)
