"""Benchmark validation: play N self-play episodes to completion, jitted.

Parity with reference ``validate_gpu`` (src/selfplay/validation.py:6-44):
fresh env sized ``n_episodes``, forced half-Black/half-White agent sides,
stochastic actions, record each env's FIRST terminal reward, return
win/loss/draw/score rates keyed ``validation/vs_benchmark/*``.

TPU re-design: the reference's host ``while active_mask.any()`` loop becomes
a single ``lax.while_loop`` inside one jitted program — games of unequal
length run under an active mask with static shapes (SURVEY.md §7 hard part
"games of unequal length inside a fixed-shape scan").
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..env.mnk_env import EnvConfig
from .wrapper import selfplay_reset, selfplay_step


@functools.partial(
    jax.jit, static_argnames=("cfg", "agent_apply", "opponent_apply", "n_episodes")
)
def _validate_jit(
    cfg: EnvConfig,
    agent_apply: Callable,
    opponent_apply: Callable,
    agent_params: Any,
    opponent_params: Any,
    n_episodes: int,
    rng: jax.Array,
):
    # Forced sides: first half Black, second half White (reference :14-17).
    sides = jnp.concatenate(
        [
            jnp.zeros((n_episodes // 2,), jnp.int32),
            jnp.ones((n_episodes - n_episodes // 2,), jnp.int32),
        ]
    )
    rng, k_reset = jax.random.split(rng)
    state, obs = selfplay_reset(
        cfg, opponent_apply, opponent_params, n_episodes, k_reset, agent_side=sides
    )

    def cond(carry):
        _, _, _, active, _ = carry
        return active.any()

    def body(carry):
        state, obs, finished, active, rng = carry
        rng, k_act, k_step = jax.random.split(rng, 3)
        actions = agent_apply(agent_params, k_act, obs, False)
        state, obs, rewards, terminated = selfplay_step(
            cfg, opponent_apply, opponent_params, state, actions, k_step
        )
        just_finished = terminated & active
        finished = jnp.where(just_finished, rewards, finished)
        active = active & ~terminated
        return state, obs, finished, active, rng

    finished = jnp.zeros((n_episodes,), jnp.float32)
    active = jnp.ones((n_episodes,), bool)
    _, _, finished, _, _ = jax.lax.while_loop(
        cond, body, (state, obs, finished, active, rng)
    )

    wins = (finished == 1.0).sum()
    losses = (finished == -1.0).sum()
    draws = (finished == 0.0).sum()
    return wins, losses, draws


def validate(
    cfg: EnvConfig,
    agent_apply: Callable,
    agent_params: Any,
    opponent_apply: Callable,
    opponent_params: Any,
    n_episodes: int,
    rng: jax.Array,
) -> dict:
    """Win/loss/draw/score rates vs an opponent (reference keys :38-44)."""
    wins, losses, draws = _validate_jit(
        cfg,
        agent_apply,
        opponent_apply,
        agent_params,
        opponent_params,
        n_episodes,
        rng,
    )
    wins, losses, draws = int(wins), int(losses), int(draws)
    return {
        "validation/vs_benchmark/win_rate": wins / n_episodes,
        "validation/vs_benchmark/loss_rate": losses / n_episodes,
        "validation/vs_benchmark/draw_rate": draws / n_episodes,
        "validation/vs_benchmark/score_rate": (wins + 0.5 * draws) / n_episodes,
        "validation/vs_benchmark/games_played": n_episodes,
    }
