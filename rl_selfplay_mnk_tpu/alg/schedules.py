"""Learning-rate and entropy-coefficient schedules.

Both reference schedulers advance ONCE PER TRAINING ITERATION, not per
optimizer step (src/alg/lr_scheduler.py docstring + src/alg/ppo.py:142-146),
so the schedules here are step-functions of the iteration index.

LR (reference lr_scheduler.py:7-61): linear warmup 0.01x -> 1.0x over
``warmup_env_steps`` worth of iterations, then either constant 1.0x or a
linear decay 1.0x -> 0.1x over the remaining iterations.

Entropy coef (reference entropy_scheduler.py:4-58): iteration -> env-step
conversion via ``num_envs * n_steps``; linear interpolation to
``final_coef`` over ``total_steps``, or exponential decay. The coefficient
used during iteration i is the value after i scheduler steps (the reference
steps the scheduler at the END of each iteration).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp


def make_lr_schedule(
    base_lr: float,
    warmup_env_steps: int,
    total_env_steps: int,
    num_envs: int,
    n_steps: int,
    updates_per_iteration: int,
    decay: bool = False,
):
    """optax-compatible schedule: update-count -> lr.

    ``updates_per_iteration`` (= ppo_epochs * num_minibatches) converts the
    optimizer's update counter back to the iteration index so the lr is
    piecewise-constant within an iteration, exactly like the reference's
    per-iteration ``scheduler.step()``.
    """
    steps_per_iteration = num_envs * n_steps
    total_iterations = max(1, total_env_steps // steps_per_iteration)
    warmup_iterations = (
        max(1, warmup_env_steps // steps_per_iteration) if warmup_env_steps > 0 else 0
    )
    decay_iterations = max(1, total_iterations - warmup_iterations)

    def schedule(count):
        it = count // updates_per_iteration
        it = jnp.asarray(it, jnp.float32)
        if warmup_iterations > 0:
            wfrac = jnp.clip(it / warmup_iterations, 0.0, 1.0)
        else:
            wfrac = jnp.asarray(1.0)
        warm_factor = 0.01 + 0.99 * wfrac
        if decay:
            dfrac = jnp.clip((it - warmup_iterations) / decay_iterations, 0.0, 1.0)
            main_factor = 1.0 - 0.9 * dfrac
        else:
            main_factor = jnp.asarray(1.0)
        factor = jnp.where(it < warmup_iterations, warm_factor, main_factor)
        return base_lr * factor

    return schedule


def entropy_coef_at(
    initial_coef: float,
    schedule: Optional[Dict[str, Any]],
    iteration: int,
    num_envs: int,
    n_steps: int,
) -> float:
    """Entropy coefficient in effect during training iteration ``iteration``
    (0-based). Host-side float math; passed into the jitted update as a
    scalar."""
    if schedule is None or iteration <= 0:
        return float(initial_coef)
    env_steps = iteration * num_envs * n_steps
    stype = schedule.get("type", "constant")
    params = schedule.get("params", {})
    if stype == "linear":
        final_coef = params.get("final_coef", 0.0)
        total_steps = params.get("total_steps", 10_000_000)
        if env_steps >= total_steps:
            return float(final_coef)
        progress = env_steps / total_steps
        return float(initial_coef * (1 - progress) + final_coef * progress)
    if stype == "exponential":
        decay_rate = params.get("decay_rate", 0.99)
        return float(initial_coef * (decay_rate ** (env_steps / 1000)))
    return float(initial_coef)


def make_entropy_coef_fn(
    initial_coef: float,
    schedule: Optional[Dict[str, Any]],
    num_envs: int,
    n_steps: int,
):
    """Device-side counterpart of :func:`entropy_coef_at`.

    Returns ``fn(iteration: traced int) -> f32 scalar`` with identical math,
    for use INSIDE compiled programs (the fused multi-iteration trainer,
    alg/fused.py, computes the coefficient on device so whole blocks of
    iterations need no host input).
    """
    initial = float(initial_coef)
    steps_per_iter = float(num_envs * n_steps)
    stype = (schedule or {}).get("type", "constant")
    params = (schedule or {}).get("params", {})

    if schedule is not None and stype == "linear":
        final = float(params.get("final_coef", 0.0))
        total = float(params.get("total_steps", 10_000_000))

        def fn(iteration):
            env_steps = jnp.asarray(iteration, jnp.float32) * steps_per_iter
            progress = jnp.clip(env_steps / total, 0.0, 1.0)
            coef = initial * (1.0 - progress) + final * progress
            return jnp.where(iteration <= 0, initial, coef).astype(jnp.float32)

        return fn

    if schedule is not None and stype == "exponential":
        decay_rate = float(params.get("decay_rate", 0.99))

        def fn(iteration):
            env_steps = jnp.asarray(iteration, jnp.float32) * steps_per_iter
            coef = initial * jnp.power(decay_rate, env_steps / 1000.0)
            return jnp.where(iteration <= 0, initial, coef).astype(jnp.float32)

        return fn

    def fn(iteration):
        del iteration
        return jnp.float32(initial)

    return fn
