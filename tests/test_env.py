"""Engine-core tests: win-detection oracle, step semantics, masks, resets.

Covers (and extends) the env-level behavior pinned by the reference's
integration suite (src/tests/test_mnk_integration.py) plus per-kernel unit
tests the reference lacks (SURVEY.md §4 implication).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rl_selfplay_mnk_tpu.env import (
    EnvConfig,
    make_env_state,
    reset_where,
    observe,
    step,
    check_wins,
    validate_step_inputs,
)
from rl_selfplay_mnk_tpu.env.lines import line_matrix, num_lines


def brute_force_win(plane: np.ndarray, k: int) -> bool:
    """NumPy oracle: does this (M, N) 0/1 plane contain K in a row?"""
    m, n = plane.shape
    for r in range(m):
        for c in range(n):
            for dr, dc in ((0, 1), (1, 0), (1, 1), (1, -1)):
                rr, cc = r + (k - 1) * dr, c + (k - 1) * dc
                if not (0 <= rr < m and 0 <= cc < n):
                    continue
                if all(plane[r + i * dr, c + i * dc] == 1 for i in range(k)):
                    return True
    return False


@pytest.mark.parametrize("m,n,k", [(3, 3, 3), (5, 5, 4), (9, 9, 5), (4, 7, 3)])
def test_win_check_matches_brute_force(m, n, k):
    rng = np.random.default_rng(0)
    cfg = EnvConfig(m, n, k)
    planes = (rng.random((256, m, n)) < 0.4).astype(np.float32)
    got = np.asarray(check_wins(cfg, jnp.asarray(planes.reshape(256, -1))))
    want = np.array([brute_force_win(p, k) for p in planes])
    np.testing.assert_array_equal(got, want)


def test_line_matrix_counts():
    # closed-form line count: horizontals + verticals + 2 diagonal families
    for m, n, k in [(3, 3, 3), (9, 9, 5), (13, 13, 5), (5, 8, 4)]:
        expect = m * (n - k + 1) + n * (m - k + 1) + 2 * (m - k + 1) * (n - k + 1)
        assert num_lines(m, n, k) == expect
        lm = line_matrix(m, n, k)
        assert lm.shape == (m * n, expect)
        assert (lm.sum(axis=0) == k).all()


def test_step_places_stone_and_alternates_player():
    cfg = EnvConfig(3, 3, 3)
    s = make_env_state(cfg, 2)
    s, r, d = step(cfg, s, jnp.array([4, 0]))
    assert s.boards[0, 0, 1, 1] == 1.0  # black stone at center of env 0
    assert s.boards[1, 0, 0, 0] == 1.0
    assert (s.boards[:, 1] == 0).all()
    assert (np.asarray(s.current_player) == [1, 1]).all()
    assert (np.asarray(s.move_count) == [1, 1]).all()
    assert not np.asarray(d).any() and not np.asarray(r).any()

    # white replies only in env 0 (env 1 inactive)
    s, r, d = step(cfg, s, jnp.array([0, 8]), active=jnp.array([True, False]))
    assert s.boards[0, 1, 0, 0] == 1.0
    assert s.boards[1, 1].sum() == 0  # env 1 untouched
    assert (np.asarray(s.current_player) == [0, 1]).all()
    assert (np.asarray(s.move_count) == [2, 1]).all()


def test_horizontal_win_reward_and_done():
    # Reference test_env_horizontal_win (test_mnk_integration.py:50-65):
    # black completes the top row on a 3x3x3 board.
    cfg = EnvConfig(3, 3, 3)
    s = make_env_state(cfg, 1)
    for black, white in [(0, 3), (1, 4)]:
        s, r, d = step(cfg, s, jnp.array([black]))
        assert not np.asarray(d)[0]
        s, r, d = step(cfg, s, jnp.array([white]))
        assert not np.asarray(d)[0]
    s, r, d = step(cfg, s, jnp.array([2]))  # completes row 0
    assert np.asarray(d)[0]
    assert np.asarray(r)[0] == 1.0


def test_draw_full_board_zero_reward():
    # 3x3x3 draw line-up: a known drawn fill order.
    cfg = EnvConfig(3, 3, 3)
    s = make_env_state(cfg, 1)
    moves = [0, 1, 2, 4, 3, 5, 7, 6, 8]  # X O X / O X O / O X ... no 3-row
    results = []
    for mv in moves:
        s, r, d = step(cfg, s, jnp.array([mv]))
        results.append((float(r[0]), bool(d[0])))
    *_, last = results
    assert last == (0.0, True)
    assert all(not d for _, d in results[:-1])
    assert int(s.move_count[0]) == 9


def test_observe_action_mask():
    cfg = EnvConfig(3, 3, 3)
    s = make_env_state(cfg, 1)
    s, _, _ = step(cfg, s, jnp.array([4]))
    obs = observe(s)
    mask = np.asarray(obs["action_mask"])[0]
    assert not mask[4] and mask.sum() == 8
    assert obs["observation"].shape == (1, 2, 3, 3)


def test_reset_where_partial():
    cfg = EnvConfig(3, 3, 3)
    s = make_env_state(cfg, 3)
    s, _, _ = step(cfg, s, jnp.array([0, 1, 2]))
    s = reset_where(s, jnp.array([True, False, True]))
    assert s.boards[0].sum() == 0 and s.boards[2].sum() == 0
    assert s.boards[1].sum() == 1
    assert (np.asarray(s.current_player) == [0, 1, 0]).all()
    assert (np.asarray(s.move_count) == [0, 1, 0]).all()


def test_validate_step_inputs_flags_illegal():
    # The reference intended these invariants but never wired them
    # (torch_vector_mnk_env.py:86-104); here they are a real, wired check.
    cfg = EnvConfig(3, 3, 3)
    s = make_env_state(cfg, 3)
    s, _, _ = step(cfg, s, jnp.array([4, 4, 4]))
    oob, occ = validate_step_inputs(cfg, s, jnp.array([9, 4, 0]))
    assert np.asarray(oob).tolist() == [True, False, False]
    assert np.asarray(occ).tolist() == [False, True, False]


def test_step_is_jittable_and_shardable():
    cfg = EnvConfig(3, 3, 3)
    stepj = jax.jit(lambda s, a: step(cfg, s, a))
    s = make_env_state(cfg, 16)
    s2, r, d = stepj(s, jnp.full((16,), 4, dtype=jnp.int32))
    assert s2.boards.shape == (16, 2, 3, 3)

    # shard envs over the 8 virtual CPU devices
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:8]), ("env",))
    sharding = NamedSharding(mesh, P("env"))
    s = make_env_state(cfg, 16)
    s = jax.tree.map(lambda x: jax.device_put(x, sharding), s)
    s2, r, d = jax.jit(lambda s, a: step(cfg, s, a))(
        s, jax.device_put(jnp.full((16,), 4, dtype=jnp.int32), sharding)
    )
    assert s2.boards.sharding.spec == P("env")


def test_random_playout_vs_oracle():
    """Play random full games; every step's done/reward must match the oracle."""
    cfg = EnvConfig(4, 4, 3)
    rng = np.random.default_rng(42)
    stepj = jax.jit(lambda s, a: step(cfg, s, a))
    for _ in range(8):
        s = make_env_state(cfg, 1)
        done = False
        moves = 0
        while not done:
            mask = np.asarray(observe(s)["action_mask"])[0]
            legal = np.flatnonzero(mask)
            a = int(rng.choice(legal))
            mover = int(s.current_player[0])
            s, r, d = stepj(s, jnp.array([a]))
            moves += 1
            plane = np.asarray(s.boards)[0, mover]
            won = brute_force_win(plane, cfg.k)
            assert float(r[0]) == (1.0 if won else 0.0)
            done = bool(d[0])
            assert done == (won or moves == 16)
