"""Pallas kernel equivalence tests (interpret mode on the CPU mesh).

Each fused kernel must match its XLA reference implementation bit-for-bit
over randomized playouts.
"""

import numpy as np
import jax
import jax.numpy as jnp

from rl_selfplay_mnk_tpu.env import EnvConfig, make_env_state, observe, step
from rl_selfplay_mnk_tpu.ops.pallas_env import fused_step


def test_fused_residual_block_matches_xla():
    from jax import lax

    from rl_selfplay_mnk_tpu.ops.pallas_resnet import (
        conv_kernel_to_im2col,
        fused_residual_block,
    )

    rng = np.random.default_rng(0)
    b, m, n, c = 8, 5, 5, 16
    x = jnp.asarray(rng.normal(size=(b, m, n, c)).astype(np.float32))
    k1 = jnp.asarray((rng.normal(size=(3, 3, c, c)) * 0.1).astype(np.float32))
    b1 = jnp.asarray((rng.normal(size=(c,)) * 0.1).astype(np.float32))
    k2 = jnp.asarray((rng.normal(size=(3, 3, c, c)) * 0.1).astype(np.float32))
    b2 = jnp.asarray((rng.normal(size=(c,)) * 0.1).astype(np.float32))

    def xla_block(x):
        dn = ("NHWC", "HWIO", "NHWC")
        h = lax.conv_general_dilated(x, k1, (1, 1), "SAME", dimension_numbers=dn) + b1
        h = jnp.maximum(h, 0)
        y = lax.conv_general_dilated(h, k2, (1, 1), "SAME", dimension_numbers=dn) + b2
        return jnp.maximum(y + x, 0)

    want = np.asarray(xla_block(x))
    got = np.asarray(
        fused_residual_block(
            x.reshape(b, m * n, c),
            conv_kernel_to_im2col(k1),
            b1,
            conv_kernel_to_im2col(k2),
            b2,
            m,
            n,
            tile_boards=4,
            interpret=True,
        )
    ).reshape(b, m, n, c)
    np.testing.assert_allclose(want, got, rtol=2e-5, atol=2e-5)


def test_env_config_pallas_dispatch():
    """EnvConfig(use_pallas=True) must route step() through the kernel and
    produce identical results (interpret mode on CPU)."""
    cfg = EnvConfig(3, 3, 3)
    cfg_p = EnvConfig(3, 3, 3, use_pallas=True)
    s = make_env_state(cfg, 8)
    a = jnp.arange(8, dtype=jnp.int32) % 9
    s1, r1, d1 = step(cfg, s, a)
    s2, r2, d2 = step(cfg_p, s, a)
    np.testing.assert_array_equal(np.asarray(s1.boards), np.asarray(s2.boards))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_fused_step_matches_xla_random_playout():
    cfg = EnvConfig(5, 5, 4)
    e = 64
    rng = np.random.default_rng(0)
    s_ref = make_env_state(cfg, e)
    s_pal = make_env_state(cfg, e)

    for t in range(30):
        mask = np.asarray(observe(s_ref)["action_mask"])
        # random legal actions (fall back to 0 on full boards)
        actions = np.array(
            [rng.choice(np.flatnonzero(m)) if m.any() else 0 for m in mask],
            dtype=np.int32,
        )
        active = rng.random(e) < 0.8
        a = jnp.asarray(actions)
        act = jnp.asarray(active)

        s_ref, r_ref, d_ref = step(cfg, s_ref, a, act)
        m_ref = observe(s_ref)["action_mask"]

        s_pal, r_pal, d_pal, m_pal = fused_step(
            cfg, s_pal, a, act, tile_envs=32, interpret=True
        )

        np.testing.assert_array_equal(
            np.asarray(s_ref.boards), np.asarray(s_pal.boards), err_msg=f"t={t}"
        )
        np.testing.assert_array_equal(
            np.asarray(s_ref.current_player), np.asarray(s_pal.current_player)
        )
        np.testing.assert_array_equal(
            np.asarray(s_ref.move_count), np.asarray(s_pal.move_count)
        )
        np.testing.assert_array_equal(np.asarray(r_ref), np.asarray(r_pal))
        np.testing.assert_array_equal(np.asarray(d_ref), np.asarray(d_pal))
        np.testing.assert_array_equal(np.asarray(m_ref), np.asarray(m_pal))
