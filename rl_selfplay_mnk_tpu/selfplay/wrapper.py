"""Self-play wrapper: two-player env -> single-agent vector env, as pure fns.

Behavioral parity with the reference ``TorchSelfPlayWrapper``
(src/selfplay/torch_self_play_wrapper.py:6-115):

  * per-env random ``agent_side`` (:26, :43-45);
  * opponent auto-moves whenever it is its turn (:69-97);
  * delayed auto-reset: the step after a terminal ignores the agent's action
    and resets that env (:33-46, :65) — proven semantics in reference test
    ``test_autoreset_next_step``;
  * zero-sum reward: agent's winning move -> +1, opponent's winning reply ->
    -1 via ``rewards -= opp_r`` (:53, :62);
  * canonical observation: channel-flipped when the viewing player is White
    so "my stones" are always channel 0 (:87-89, :104-106); an all-False
    action mask is patched to allow action 0 (:108-110);
  * reset-path opponent rewards/terminations are discarded (:46 return value
    ignored) — preserved exactly (SURVEY.md §7 quirk 6).

TPU re-design: the reference runs the opponent network twice per step (once
for reset-path envs, once for surviving envs) on data-dependent index
subsets. Here both collapse into ONE dense masked forward over the full
batch — envs are disjoint and the opponent runs in eval mode, so the merge
is semantics-preserving while keeping every shape static inside ``scan``.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..env.constants import PLAYER_WHITE
from ..env.mnk_env import (
    EnvConfig,
    EnvState,
    make_env_state,
    observe,
    reset_where,
    step,
)


class SelfPlayState(NamedTuple):
    env: EnvState
    agent_side: jax.Array  # (E,) int32 — which color the learner plays
    pending_resets: jax.Array  # (E,) bool — envs to auto-reset next step


def flip_channels(observation: jax.Array, flip: jax.Array) -> jax.Array:
    """Swap me/enemy planes on the selected envs (dense select).

    THE canonicalization contract: every surface that shows a White-mover a
    board (training wrapper, validation, tournament match runner, play CLI)
    goes through this one function."""
    return jnp.where(
        flip[:, None, None, None], observation[:, ::-1], observation
    )


_flip_channels = flip_channels  # internal alias (historical name)


def canonical_obs(state: SelfPlayState) -> dict:
    """Observation from the learner's perspective (reference :99-112)."""
    raw = observe(state.env)
    obs = _flip_channels(raw["observation"], state.agent_side == PLAYER_WHITE)
    mask = raw["action_mask"]
    invalid = ~mask.any(axis=1, keepdims=True)
    mask = mask.at[:, 0].set(jnp.where(invalid[:, 0], True, mask[:, 0]))
    return {"observation": obs, "action_mask": mask}


def _opponent_phase(
    cfg: EnvConfig,
    opponent_apply: Callable,
    opponent_params: Any,
    env: EnvState,
    agent_side: jax.Array,
    eligible: jax.Array,
    rng: jax.Array,
) -> Tuple[EnvState, jax.Array, jax.Array, jax.Array]:
    """Opponent moves on every eligible env where it holds the turn.

    Dense equivalent of reference ``_opponent_move_if_needed`` (:69-97): the
    network runs on the whole batch; actions are applied only under the
    ``opp_turn`` mask. The opponent sees the board canonical to the color it
    is playing (flip when it moves as White, :87-89).
    """
    opp_turn = eligible & (env.current_player != agent_side)
    raw = observe(env)
    observation = _flip_channels(
        raw["observation"], env.current_player == PLAYER_WHITE
    )
    actions = opponent_apply(
        opponent_params,
        rng,
        {"observation": observation, "action_mask": raw["action_mask"]},
        False,
    )
    env, rewards, dones = step(cfg, env, actions, opp_turn)
    return env, rewards, dones, opp_turn


def selfplay_reset(
    cfg: EnvConfig,
    opponent_apply: Callable,
    opponent_params: Any,
    num_envs: int,
    rng: jax.Array,
    agent_side: Optional[jax.Array] = None,
) -> Tuple[SelfPlayState, dict]:
    """Full reset (reference :19-30): fresh boards, new sides, opponent moves
    first wherever the agent is White."""
    k_side, k_opp = jax.random.split(rng)
    env = make_env_state(cfg, num_envs)
    if agent_side is None:
        agent_side = jax.random.randint(k_side, (num_envs,), 0, 2, dtype=jnp.int32)
    else:
        agent_side = jnp.asarray(agent_side, dtype=jnp.int32)
    eligible = jnp.ones((num_envs,), dtype=bool)
    env, _, _, _ = _opponent_phase(
        cfg, opponent_apply, opponent_params, env, agent_side, eligible, k_opp
    )
    state = SelfPlayState(
        env=env,
        agent_side=agent_side,
        pending_resets=jnp.zeros((num_envs,), dtype=bool),
    )
    return state, canonical_obs(state)


def selfplay_step(
    cfg: EnvConfig,
    opponent_apply: Callable,
    opponent_params: Any,
    state: SelfPlayState,
    actions: jax.Array,
    rng: jax.Array,
) -> Tuple[SelfPlayState, dict, jax.Array, jax.Array]:
    """One learner step (reference :32-67). Returns
    ``(state, obs, rewards, terminated)`` — the reference's ``truncated`` is
    always zero and ``info`` empty, so they are omitted here.
    """
    k_side, k_opp = jax.random.split(rng)
    e = state.env.num_envs

    # Phase 0 — delayed auto-resets (:39-46): reset boards, redraw sides.
    reset_mask = state.pending_resets
    play = ~reset_mask
    env = reset_where(state.env, reset_mask)
    new_sides = jax.random.randint(k_side, (e,), 0, 2, dtype=jnp.int32)
    agent_side = jnp.where(reset_mask, new_sides, state.agent_side)

    # Phase 1 — agent moves on non-reset envs (:48-54).
    env, r_ag, t_ag = step(cfg, env, actions, play)
    rewards = jnp.where(play, r_ag, 0.0)
    terminated = t_ag & play

    # Phase 2 — single fused opponent pass covering both the reference's
    # reset-path call (:46) and survivor-path call (:59).
    survivors = play & ~terminated
    eligible = reset_mask | survivors
    env, r_opp, t_opp, opp_turn = _opponent_phase(
        cfg, opponent_apply, opponent_params, env, agent_side, eligible, k_opp
    )
    # Reward/termination bookkeeping applies only to the survivor path
    # (:62-63); reset-path opponent outcomes are discarded like the
    # reference's ignored return at :46.
    rewards = rewards - jnp.where(survivors, r_opp, 0.0)
    terminated = jnp.where(survivors, t_opp, terminated)

    new_state = SelfPlayState(
        env=env, agent_side=agent_side, pending_resets=terminated
    )
    return new_state, canonical_obs(new_state), rewards, terminated
