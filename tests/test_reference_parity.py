"""Bit-exact behavioral parity against the actual PyTorch reference.

Drives the reference's ``TorchVectorMnkEnv`` / ``TorchSelfPlayWrapper``
(imported from /root/reference, torch-CPU) and this framework's pure
functions with IDENTICAL deterministic action sequences, asserting equal
board states, rewards, terminations and canonical observations at every
step — the BASELINE.md correctness-parity criterion, RNG-free.

Skipped automatically when the reference checkout or torch is unavailable.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference/src"
torch = pytest.importorskip("torch")
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference checkout not available", allow_module_level=True)
sys.path.insert(0, REF)

from env.torch_vector_mnk_env import TorchVectorMnkEnv  # noqa: E402
from selfplay.torch_self_play_wrapper import TorchSelfPlayWrapper  # noqa: E402

from rl_selfplay_mnk_tpu.env import EnvConfig, make_env_state, observe, step  # noqa: E402
from rl_selfplay_mnk_tpu.selfplay import (  # noqa: E402
    Policy,
    selfplay_reset,
    selfplay_step,
)


def first_legal(mask_row: np.ndarray, offset: int = 0) -> int:
    legal = np.flatnonzero(mask_row)
    return int(legal[offset % len(legal)])


@pytest.mark.parametrize("m,n,k", [(3, 3, 3), (5, 5, 4), (4, 6, 3)])
def test_env_step_parity_random_playouts(m, n, k):
    """Same action sequence -> identical boards/rewards/dones, full games."""
    rng = np.random.default_rng(0)
    e = 4
    ref = TorchVectorMnkEnv(m, n, k, num_envs=e, device="cpu")
    ref.reset()
    cfg = EnvConfig(m, n, k)
    s = make_env_state(cfg, e)

    done_ref = np.zeros(e, bool)
    for t in range(m * n):
        obs_ref = ref.observe()
        mask_ref = obs_ref["action_mask"].numpy()
        mask_jax = np.asarray(observe(s)["action_mask"])
        np.testing.assert_array_equal(mask_ref, mask_jax)

        active = ~done_ref
        if not active.any():
            break
        actions = np.array(
            [
                first_legal(mask_ref[i], rng.integers(0, 64)) if active[i] else 0
                for i in range(e)
            ]
        )
        active_idx = torch.tensor(np.flatnonzero(active))
        _, r_ref, d_ref = ref.step_subset(
            torch.tensor(actions[active]), active_idx
        )
        s, r_jax, d_jax = step(cfg, s, jnp.asarray(actions), jnp.asarray(active))

        np.testing.assert_array_equal(
            ref.boards.numpy(), np.asarray(s.boards), err_msg=f"t={t}"
        )
        np.testing.assert_array_equal(
            ref.current_player.numpy(), np.asarray(s.current_player)
        )
        np.testing.assert_array_equal(
            ref.move_counts.numpy(), np.asarray(s.move_count)
        )
        np.testing.assert_array_equal(r_ref.numpy(), np.asarray(r_jax))
        np.testing.assert_array_equal(d_ref.numpy(), np.asarray(d_jax))
        done_ref |= d_ref.numpy()


class _TorchScripted:
    """Deterministic torch-side policy: k-th legal move, k from a shared
    pre-drawn sequence so both frameworks consume identical choices."""

    def __init__(self, choices):
        self.choices = choices
        self.calls = 0

    def act(self, obs, deterministic=False):
        mask = obs["action_mask"].numpy()
        out = []
        for row in mask:
            out.append(first_legal(row, self.choices[self.calls % len(self.choices)]))
            self.calls += 1
        return torch.tensor(out)


def _jax_scripted(choices):
    """JAX-side scripted policy consuming the same sequence positionally.

    The wrapper runs the policy densely over all envs each opponent phase,
    exactly like the torch wrapper runs it over the active subset — so the
    call counter must advance per (phase, env) in the same order. We index
    the sequence by a step counter held in a mutable cell (host-side; fine
    because these tests run eagerly)."""
    counter = {"calls": 0}

    def act(params, rng, obs, deterministic=False):
        mask = np.asarray(obs["action_mask"])
        out = []
        for row in mask:
            out.append(first_legal(row, choices[counter["calls"] % len(choices)]))
            counter["calls"] += 1
        return jnp.asarray(np.array(out, dtype=np.int32))

    return Policy(apply=act, params=None), counter


@pytest.mark.parametrize("agent_side", [0, 1])
def test_wrapper_episode_parity(agent_side):
    """One full episode through both wrappers with scripted agent+opponent:
    canonical observations, rewards and termination must match step for
    step (until the first terminal, before autoreset randomness kicks in)."""
    m = n = 3
    k = 3
    e = 2
    opp_choices = [0] * 64  # opponent: always first legal
    agent_choices = [1, 0, 2, 0, 1, 0, 1, 0, 0, 0, 0, 0] * 8

    # --- torch side ---
    ref_env = TorchVectorMnkEnv(m, n, k, num_envs=e, device="cpu")
    ref_wrap = TorchSelfPlayWrapper(ref_env)
    ref_wrap.set_opponent(_TorchScripted(list(opp_choices)))
    sides = torch.full((e,), agent_side, dtype=torch.long)
    obs_ref, _ = ref_wrap.reset(options={"agent_side": sides})

    # --- jax side ---
    cfg = EnvConfig(m, n, k)
    jpol, _ = _jax_scripted(list(opp_choices))
    state, obs_jax = selfplay_reset(
        cfg,
        jpol.apply,
        None,
        e,
        jax.random.PRNGKey(0),
        agent_side=jnp.full((e,), agent_side, dtype=jnp.int32),
    )

    for t in range(10):
        np.testing.assert_array_equal(
            obs_ref["observation"].numpy(),
            np.asarray(obs_jax["observation"]),
            err_msg=f"obs mismatch t={t}",
        )
        np.testing.assert_array_equal(
            obs_ref["action_mask"].numpy(), np.asarray(obs_jax["action_mask"])
        )
        actions = np.array(
            [
                first_legal(
                    obs_ref["action_mask"].numpy()[i], agent_choices[t * e + i]
                )
                for i in range(e)
            ]
        )
        obs_ref, r_ref, t_ref, _, _ = ref_wrap.step(torch.tensor(actions))
        state, obs_jax, r_jax, t_jax = selfplay_step(
            cfg, jpol.apply, None, state, jnp.asarray(actions), jax.random.PRNGKey(t)
        )
        np.testing.assert_array_equal(r_ref.numpy(), np.asarray(r_jax), f"t={t}")
        np.testing.assert_array_equal(t_ref.numpy(), np.asarray(t_jax), f"t={t}")
        if bool(t_ref.any()):
            break  # autoreset side redraws are RNG-divergent beyond here
