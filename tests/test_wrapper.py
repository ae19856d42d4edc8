"""Self-play wrapper behavioral-contract tests.

Ports the semantics pinned by the reference integration suite
(src/tests/test_mnk_integration.py) onto the pure-functional wrapper:
canonical views, zero-sum rewards through the opponent-reply path, delayed
auto-reset, and opponent-moves-first — all on a 3x3x3 board.
"""

import numpy as np
import jax
import jax.numpy as jnp

from rl_selfplay_mnk_tpu.env import EnvConfig, PLAYER_BLACK, PLAYER_WHITE
from rl_selfplay_mnk_tpu.selfplay import (
    Policy,
    RandomPolicy,
    SelfPlayState,
    selfplay_reset,
    selfplay_step,
    canonical_obs,
    validate,
)

CFG = EnvConfig(3, 3, 3)


def scripted(cell: int) -> Policy:
    """Deterministic fake opponent always playing ``cell`` (reference
    ScriptedPolicy, test_mnk_integration.py:11-24)."""

    def act(params, rng, obs, deterministic=False):
        e = obs["action_mask"].shape[0]
        return jnp.full((e,), cell, dtype=jnp.int32)

    return Policy(apply=act, params=None)


def fresh(agent_side: int, opp: Policy, num_envs: int = 1):
    rng = jax.random.PRNGKey(0)
    side = jnp.full((num_envs,), agent_side, dtype=jnp.int32)
    return selfplay_reset(CFG, opp.apply, opp.params, num_envs, rng, agent_side=side)


def set_board(state: SelfPlayState, black_cells, white_cells, player, moves):
    """Hand-construct a position (the reference tests mutate env.boards
    directly; here we rebuild the immutable state)."""
    boards = np.zeros((1, 2, 3, 3), np.float32)
    for c in black_cells:
        boards[0, 0, c // 3, c % 3] = 1.0
    for c in white_cells:
        boards[0, 1, c // 3, c % 3] = 1.0
    env = state.env._replace(
        boards=jnp.asarray(boards),
        current_player=jnp.array([player], jnp.int32),
        move_count=jnp.array([moves], jnp.int32),
    )
    return state._replace(env=env)


def test_agent_win_plus_one():
    # Reference test_agent_win (:117-132): black agent completes a row -> +1.
    opp = scripted(8)
    state, obs = fresh(PLAYER_BLACK, opp)
    state = set_board(state, [0, 1], [3, 4], PLAYER_BLACK, 4)
    state, obs, r, t = selfplay_step(
        CFG, opp.apply, opp.params, state, jnp.array([2]), jax.random.PRNGKey(1)
    )
    assert float(r[0]) == 1.0 and bool(t[0])
    assert bool(state.pending_resets[0])


def test_opponent_win_minus_one():
    # Reference test_opponent_win (:135-161): opponent's reply wins -> -1.
    opp = scripted(5)  # completes white column/row at 3,4,5
    state, obs = fresh(PLAYER_BLACK, opp)
    state = set_board(state, [0, 1, 6], [3, 4], PLAYER_BLACK, 5)
    # agent plays 8 (no win); opponent replies 5 completing 3-4-5 row.
    state, obs, r, t = selfplay_step(
        CFG, opp.apply, opp.params, state, jnp.array([8]), jax.random.PRNGKey(1)
    )
    assert float(r[0]) == -1.0 and bool(t[0])


def test_canonical_obs_black_agent_identity():
    # Reference test_canonical_obs (:89-114): black agent sees raw channels.
    opp = scripted(8)
    state, obs = fresh(PLAYER_BLACK, opp)
    state = set_board(state, [0], [4], PLAYER_BLACK, 2)
    o = canonical_obs(state)["observation"]
    assert float(o[0, 0, 0, 0]) == 1.0  # my (black) stone on channel 0
    assert float(o[0, 1, 1, 1]) == 1.0  # enemy (white) on channel 1


def test_canonical_obs_white_agent_flipped():
    opp = scripted(8)
    state, obs = fresh(PLAYER_WHITE, opp)
    state = set_board(state, [0], [4], PLAYER_WHITE, 2)
    o = canonical_obs(state)["observation"]
    assert float(o[0, 0, 1, 1]) == 1.0  # my (white) stone flipped to channel 0
    assert float(o[0, 1, 0, 0]) == 1.0  # enemy (black) on channel 1


def test_autoreset_next_step():
    # Reference test_autoreset_next_step (:164-189): the step after a
    # terminal ignores the action and resets that env.
    opp = scripted(8)
    state, obs = fresh(PLAYER_BLACK, opp)
    state = set_board(state, [0, 1], [3, 4], PLAYER_BLACK, 4)
    state, obs, r, t = selfplay_step(
        CFG, opp.apply, opp.params, state, jnp.array([2]), jax.random.PRNGKey(1)
    )
    assert bool(t[0])
    # Next step: action should be IGNORED (env resets instead).
    state2, obs2, r2, t2 = selfplay_step(
        CFG, opp.apply, opp.params, state, jnp.array([4]), jax.random.PRNGKey(2)
    )
    assert not bool(t2[0]) and float(r2[0]) == 0.0
    assert not bool(state2.pending_resets[0])
    total_stones = float(np.asarray(state2.env.boards).sum())
    # Fresh board: 0 stones if the new agent side is black, 1 if white
    # (opponent moved first).
    side = int(state2.agent_side[0])
    assert total_stones == (0.0 if side == PLAYER_BLACK else 1.0)
    assert int(state2.env.move_count[0]) == (0 if side == PLAYER_BLACK else 1)


def test_opponent_moves_first_when_agent_white():
    # Reference test_opponent_moves_first (:192-207).
    opp = scripted(4)
    state, obs = fresh(PLAYER_WHITE, opp)
    assert float(state.env.boards[0, 0, 1, 1]) == 1.0  # black opp stone at 4
    assert int(state.env.current_player[0]) == PLAYER_WHITE  # agent to move
    mask = np.asarray(obs["action_mask"])[0]
    assert not mask[4] and mask.sum() == 8


def test_opponent_sees_canonical_view_as_white():
    """When the opponent plays White its observation must be channel-flipped
    (reference wrapper :87-89). Verify via an observation-sensitive scripted
    opponent that plays cell 0 iff channel 0 holds its own stones."""

    def act(params, rng, obs, deterministic=False):
        # if my-channel (0) total >= enemy-channel total, play 1, else play 2
        mine = obs["observation"][:, 0].sum(axis=(1, 2))
        other = obs["observation"][:, 1].sum(axis=(1, 2))
        return jnp.where(mine >= other, 1, 2).astype(jnp.int32)

    opp = Policy(apply=act, params=None)
    state, obs = fresh(PLAYER_BLACK, opp)
    # Agent (black) plays 0. White opponent then has 0 stones, agent 1. With
    # a canonical (flipped) view the opponent sees mine=0 < other=1 -> 2.
    state, obs, r, t = selfplay_step(
        CFG, opp.apply, opp.params, state, jnp.array([0]), jax.random.PRNGKey(1)
    )
    assert float(state.env.boards[0, 1, 0, 2]) == 1.0  # white stone at cell 2


def test_degenerate_mask_patched():
    # Full board with no terminal (hand-constructed impossible position) must
    # still yield a usable mask: action 0 allowed (reference :108-110).
    opp = scripted(8)
    state, obs = fresh(PLAYER_BLACK, opp)
    state = set_board(state, list(range(9)), [], PLAYER_BLACK, 9)
    mask = np.asarray(canonical_obs(state)["action_mask"])[0]
    assert mask[0] and mask.sum() == 1


def test_zero_sum_over_many_random_games():
    """Random vs random through the wrapper: rewards only at terminals, in
    {-1, 0, 1}; terminal distribution is sane; all games end."""
    opp = RandomPolicy()
    rng = jax.random.PRNGKey(7)
    e = 64
    state, obs = selfplay_reset(CFG, opp.apply, opp.params, e, rng)

    stepj = jax.jit(
        lambda st, a, k: selfplay_step(CFG, opp.apply, opp.params, st, a, k)
    )
    terminals = 0
    for i in range(200):
        rng, k_act, k_step = jax.random.split(rng, 3)
        actions = RandomPolicy().apply(None, k_act, obs, False)
        state, obs, r, t = stepj(state, actions, k_step)
        r = np.asarray(r)
        t = np.asarray(t)
        assert set(np.unique(r)).issubset({-1.0, 0.0, 1.0})
        assert (r[~t] == 0).all()  # nonzero reward only at terminals
        terminals += int(t.sum())
    assert terminals > 100  # plenty of finished episodes in 200 steps


def test_validate_random_vs_random_balanced():
    res = validate(
        CFG,
        RandomPolicy().apply,
        None,
        RandomPolicy().apply,
        None,
        256,
        jax.random.PRNGKey(3),
    )
    assert res["validation/vs_benchmark/games_played"] == 256
    total = (
        res["validation/vs_benchmark/win_rate"]
        + res["validation/vs_benchmark/loss_rate"]
        + res["validation/vs_benchmark/draw_rate"]
    )
    assert abs(total - 1.0) < 1e-6
    # random-vs-random on 3x3x3 is roughly symmetric
    assert 0.2 < res["validation/vs_benchmark/score_rate"] < 0.8
