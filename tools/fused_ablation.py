"""Ablation: why is the fused multi-iteration block slower than the two
standalone programs? Times each composition on the live backend.

  standalone : jitted rollout, jitted update (the train.py path)
  scan-roll  : rollout alone inside an outer 3-iteration scan
  scan-upd   : update alone inside an outer 3-iteration scan (fixed traj)
  scan-both  : rollout+update inside the outer scan, no pool logic
  full       : alg/fused.train_block (pool draw + insert included)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import optax

from rl_selfplay_mnk_tpu.alg.fused import train_block
from rl_selfplay_mnk_tpu.alg.ppo import (
    PPOConfig,
    pick_group_size,
    rollout,
    rollout_impl,
    update,
    update_impl,
)
from rl_selfplay_mnk_tpu.alg.schedules import make_entropy_coef_fn
from rl_selfplay_mnk_tpu.env import EnvConfig
from rl_selfplay_mnk_tpu.models.registry import (
    create_model_from_architecture,
    init_network,
    make_apply_fns,
)
from rl_selfplay_mnk_tpu.selfplay.opponent_pool import pool_add, pool_init
from rl_selfplay_mnk_tpu.selfplay.policies import make_network_policy
from rl_selfplay_mnk_tpu.selfplay.wrapper import selfplay_reset
from rl_selfplay_mnk_tpu.utils.hardware import detect_hardware_config


def fetch(out):
    """Force real completion on the tunnel backend: host-fetch a scalar
    (block_until_ready alone under-reports there — PERFORMANCE.md)."""
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "size") and x.size]
    small = min(leaves, key=lambda x: x.size)
    return float(jnp.asarray(small).reshape(-1)[0])


def timed(fn, *args, n=2, **kw):
    out = fn(*args, **kw)  # compile
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
        fetch(out)
    return (time.perf_counter() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=8192)
    p.add_argument("--n-steps", type=int, default=256)
    p.add_argument("--scan-len", type=int, default=3)
    args = p.parse_args()

    hw = detect_hardware_config()
    env_cfg = EnvConfig(9, 9, 5)
    module, _ = create_model_from_architecture(
        "resnet_b_s", (2, 9, 9), 81, dtype=hw.compute_dtype
    )
    variables = init_network(module, (2, 9, 9), jax.random.PRNGKey(0))
    eval_apply, _ = make_apply_fns(module)
    policy_act = make_network_policy(eval_apply)
    config = PPOConfig(
        env=env_cfg,
        num_envs=args.num_envs,
        n_steps=args.n_steps,
        batch_size=8192,
        ppo_epochs=4,
        shuffle="grouped" if hw.is_accelerator else "global",
        group_size=pick_group_size(8192),
    )
    optimizer = optax.flatten(
        optax.chain(
            optax.clip_by_global_norm(0.5),
            optax.adamw(5e-4, eps=1e-5, weight_decay=0.01),
        )
    )
    opt_state = jax.jit(optimizer.init)(variables["params"])
    sp_state, obs = jax.jit(
        selfplay_reset, static_argnames=("cfg", "opponent_apply", "num_envs")
    )(env_cfg, policy_act, variables, args.num_envs, jax.random.PRNGKey(1))
    params, batch_stats = variables["params"], variables["batch_stats"]
    opponent = {"params": params, "batch_stats": batch_stats}
    L = args.scan_len

    # ---- standalone (no donation wrappers to keep inputs reusable) -------
    roll_nodonate = jax.jit(
        rollout_impl, static_argnames=("module", "config", "opponent_apply")
    )
    ep_zero = jnp.zeros((config.num_envs,), jnp.float32)
    t = timed(
        roll_nodonate, module, config, policy_act, params, batch_stats,
        opponent, sp_state, obs, ep_zero, ep_zero, jax.random.PRNGKey(2),
    )
    print(f"standalone rollout       : {t:.3f}s/iter")
    _, _, _, traj, _, _, _ = roll_nodonate(
        module, config, policy_act, params, batch_stats, opponent,
        sp_state, obs, ep_zero, ep_zero, jax.random.PRNGKey(2),
    )
    upd_nodonate = jax.jit(
        update_impl, static_argnames=("module", "config", "optimizer")
    )
    t = timed(
        upd_nodonate, module, config, optimizer, params, batch_stats,
        opt_state, traj, obs, jnp.float32(0.01), jax.random.PRNGKey(3),
    )
    print(f"standalone update        : {t:.3f}s/iter")

    # ---- rollout alone inside an outer scan -------------------------------
    @jax.jit
    def scan_roll(params, batch_stats, sp_state, obs, rng):
        def body(carry, _):
            sp_state, obs, batch_stats, rng = carry
            rng, k = jax.random.split(rng)
            e0 = jnp.zeros((config.num_envs,), jnp.float32)
            sp_state, obs, batch_stats, traj, fin, _, _ = rollout_impl(
                module, config, policy_act, params, batch_stats,
                {"params": params, "batch_stats": batch_stats},
                sp_state, obs, e0, e0, k,
            )
            return (sp_state, obs, batch_stats, rng), fin[2]
        carry, fins = jax.lax.scan(
            body, (sp_state, obs, batch_stats, rng), None, length=L
        )
        return carry, fins

    t = timed(scan_roll, params, batch_stats, sp_state, obs, jax.random.PRNGKey(4))
    print(f"scan({L}) rollout-only    : {t / L:.3f}s/iter")

    # ---- update alone inside an outer scan --------------------------------
    @jax.jit
    def scan_upd(params, batch_stats, opt_state, traj, obs, rng):
        def body(carry, _):
            params, batch_stats, opt_state, rng = carry
            rng, k = jax.random.split(rng)
            params, batch_stats, opt_state, metrics = update_impl(
                module, config, optimizer, params, batch_stats, opt_state,
                traj, obs, jnp.float32(0.01), k,
            )
            return (params, batch_stats, opt_state, rng), metrics["actor_loss"]
        carry, losses = jax.lax.scan(
            body, (params, batch_stats, opt_state, rng), None, length=L
        )
        return carry, losses

    t = timed(scan_upd, params, batch_stats, opt_state, traj, obs,
              jax.random.PRNGKey(5))
    print(f"scan({L}) update-only     : {t / L:.3f}s/iter")

    # ---- rollout + update inside the outer scan, no pool ------------------
    @jax.jit
    def scan_both(params, batch_stats, opt_state, sp_state, obs, rng):
        def body(carry, _):
            params, batch_stats, opt_state, sp_state, obs, rng = carry
            rng, kr, ku = jax.random.split(rng, 3)
            e0 = jnp.zeros((config.num_envs,), jnp.float32)
            sp_state, obs, batch_stats, traj, fin, _, _ = rollout_impl(
                module, config, policy_act, params, batch_stats,
                {"params": params, "batch_stats": batch_stats},
                sp_state, obs, e0, e0, kr,
            )
            params, batch_stats, opt_state, metrics = update_impl(
                module, config, optimizer, params, batch_stats, opt_state,
                traj, obs, jnp.float32(0.01), ku,
            )
            return (params, batch_stats, opt_state, sp_state, obs, rng), \
                metrics["actor_loss"]
        carry, losses = jax.lax.scan(
            body, (params, batch_stats, opt_state, sp_state, obs, rng),
            None, length=L,
        )
        return carry, losses

    t = timed(scan_both, params, batch_stats, opt_state, sp_state, obs,
              jax.random.PRNGKey(6))
    print(f"scan({L}) rollout+update  : {t / L:.3f}s/iter")

    # ---- the full fused block ---------------------------------------------
    pool = jax.jit(pool_init, static_argnames=("max_size",))(variables, max_size=20)
    pool = jax.jit(pool_add)(pool, variables, 1.0)
    entropy_fn = make_entropy_coef_fn(0.01, None, args.num_envs, args.n_steps)

    ep0 = jnp.zeros((config.num_envs,), jnp.float32)
    ep1 = jnp.zeros((config.num_envs,), jnp.float32)

    def full(params, batch_stats, opt_state, pool, sp_state, obs, rng):
        return train_block(
            module, config, optimizer, policy_act, entropy_fn, L, 0.15, 20,
            params, batch_stats, opt_state, pool, sp_state, obs,
            jnp.copy(ep0), jnp.copy(ep1), rng,
            jnp.int32(1), jnp.float32(1.0),
        )

    # train_block donates; pass fresh copies each call
    def full_fresh():
        import copy
        c = jax.tree.map(jnp.copy, (params, batch_stats, opt_state, pool,
                                    sp_state, obs))
        return full(*c, jax.random.PRNGKey(7))

    out = full_fresh()
    fetch(out)
    t0 = time.perf_counter()
    out = full_fresh()
    fetch(out)
    t = time.perf_counter() - t0
    print(f"full train_block({L})     : {t / L:.3f}s/iter (incl. copy overhead)")

    # ---- per-iteration multi-program dispatch (deferred fetch) ------------
    from rl_selfplay_mnk_tpu.alg.fused import train_step_iteration

    def steps_fresh():
        carry = jax.tree.map(
            jnp.copy,
            (params, batch_stats, opt_state, pool, sp_state, obs, ep0, ep1,
             jax.random.PRNGKey(8)),
        )
        outs = []
        for i in range(L):
            carry, m = train_step_iteration(
                module, config, optimizer, policy_act, entropy_fn,
                0.15, 20, carry, 1 + i, jnp.float32(1.0),
            )
            outs.append(m)  # futures — no fetch inside the block
        return outs

    outs = steps_fresh()
    fetch(outs[-1])
    t0 = time.perf_counter()
    outs = steps_fresh()
    fetch(outs[-1])
    t = time.perf_counter() - t0
    print(f"step dispatch x{L}        : {t / L:.3f}s/iter (incl. copy overhead)")


if __name__ == "__main__":
    main()
