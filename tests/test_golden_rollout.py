"""Golden-seed regression: the exact rollout trajectory under a fixed seed
is pinned so any change to env/wrapper/sampling semantics shows up as a
diff, not as silent training drift (SURVEY.md §4 implication).

The pinned values were produced by the round-1 implementation on CPU with
jax_default_matmul_precision=highest; regenerate deliberately (and update
the docstring) if semantics are intentionally changed:

    python -m pytest tests/test_golden_rollout.py -q --regen-golden
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from rl_selfplay_mnk_tpu.env import EnvConfig
from rl_selfplay_mnk_tpu.selfplay import RandomPolicy, selfplay_reset, selfplay_step

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_rollout.json")


def run_rollout():
    cfg = EnvConfig(3, 3, 3)
    rp = RandomPolicy()
    rng = jax.random.PRNGKey(1234)
    rng, k = jax.random.split(rng)
    state, obs = selfplay_reset(cfg, rp.apply, None, 8, k)
    actions_log, rewards_log, dones_log = [], [], []
    for t in range(40):
        rng, k_act, k_step = jax.random.split(rng, 3)
        actions = rp.apply(None, k_act, obs, False)
        state, obs, rewards, dones = selfplay_step(
            cfg, rp.apply, None, state, actions, k_step
        )
        actions_log.append(np.asarray(actions).tolist())
        rewards_log.append(np.asarray(rewards).tolist())
        dones_log.append(np.asarray(dones).astype(int).tolist())
    checksum = float(np.asarray(state.env.boards).sum())
    return {
        "actions": actions_log,
        "rewards": rewards_log,
        "dones": dones_log,
        "final_board_sum": checksum,
    }


def test_golden_rollout_trajectory():
    got = run_rollout()
    if not os.path.exists(GOLDEN_PATH):
        with open(GOLDEN_PATH, "w") as f:
            json.dump(got, f, indent=1)
        raise AssertionError(
            "golden file was missing — generated; rerun the test"
        )
    with open(GOLDEN_PATH) as f:
        want = json.load(f)
    assert got["actions"] == want["actions"]
    assert got["dones"] == want["dones"]
    np.testing.assert_allclose(
        np.array(got["rewards"]), np.array(want["rewards"]), atol=1e-6
    )
    assert abs(got["final_board_sum"] - want["final_board_sum"]) < 1e-4
