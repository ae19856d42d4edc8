"""Policies as (static apply-function, dynamic parameter pytree) pairs.

The reference's ``Policy``/``RandomPolicy``/``NNPolicy`` hierarchy
(src/selfplay/policy.py:7-54) wraps mutable ``nn.Module`` objects; here a
policy is a hashable callable plus a params pytree, so policies can ride
through ``jit``/``scan``/``while_loop`` and opponent swaps are just pytree
substitutions — which is what makes the opponent pool a device-side gather
(SURVEY.md §7 design stance).

Policy act signature (pure):
    act(params, rng, obs_dict, deterministic: bool) -> actions int32 (E,)

``obs_dict`` = {"observation": (E, 2, M, N) f32, "action_mask": (E, A) bool}.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp  # noqa: F401  (kept for policy implementations)

from ..ops.masked import (
    mask_logits,
    masked_argmax,
    masked_sample,
    random_masked_actions,
)


@dataclasses.dataclass(frozen=True)
class Policy:
    """A pure policy: ``apply(params, rng, obs, deterministic) -> actions``.

    ``apply`` must be a hashable (static) callable; all array data lives in
    ``params``.
    """

    apply: Callable[..., jax.Array]
    params: Any = None

    def act(self, obs: dict, rng: jax.Array, deterministic: bool = False):
        return self.apply(self.params, rng, obs, deterministic)


def _random_act(params, rng, obs, deterministic=False):
    del params
    return random_masked_actions(rng, obs["action_mask"], deterministic)


def RandomPolicy() -> Policy:
    """Uniform-over-legal policy (reference policy.py:13-29)."""
    return Policy(apply=_random_act, params=None)


@functools.lru_cache(maxsize=None)
def make_network_policy(network_apply: Callable) -> Callable:
    """Lift a network apply into a policy act function.

    ``network_apply(variables, obs, mask, train) -> (logits, value)`` with
    raw (unmasked) logits; masking/sampling happen here, matching the
    reference forward's mask-then-Categorical contract
    (src/alg/architectures/cnn.py:63-80) and ``NNPolicy.act``
    (policy.py:37-54: eval mode, no grad, sample or argmax).
    """

    def act(params, rng, obs, deterministic=False):
        logits, _ = network_apply(
            params, obs["observation"], obs["action_mask"], train=False
        )
        logits = mask_logits(logits, obs["action_mask"])
        if deterministic:
            return masked_argmax(logits)
        return masked_sample(rng, logits)

    return act


def NNPolicy(network_apply: Callable, variables: Any) -> Policy:
    """Policy over a trained network's variables (params + batch_stats)."""
    return Policy(apply=make_network_policy(network_apply), params=variables)


@functools.lru_cache(maxsize=None)
def make_block_pooled_policy(network_apply: Callable, num_blocks: int) -> Callable:
    """Per-env-block opponent assignment from a stacked parameter pool.

    ``params`` is a pytree whose leaves carry a leading ``num_blocks`` axis
    (e.g. K opponents gathered from the device pool). The env batch is
    split into K contiguous blocks; block i plays against parameter set i.
    One ``vmap`` over the stacked axis keeps total compute equal to a
    single full-batch forward — this is the device-side-gather opponent
    mixing the BASELINE.json north star calls for, beyond the reference's
    one-opponent-per-iteration schedule.
    """

    def act(stacked_params, rng, obs, deterministic=False):
        observation = obs["observation"]
        mask = obs["action_mask"]
        e = observation.shape[0]
        assert e % num_blocks == 0, (
            f"num_envs {e} must divide into {num_blocks} opponent blocks"
        )
        per = e // num_blocks
        obs_blocks = observation.reshape((num_blocks, per) + observation.shape[1:])
        mask_blocks = mask.reshape((num_blocks, per) + mask.shape[1:])

        def one(params, ob, mb):
            logits, _ = network_apply(params, ob, mb, train=False)
            return mask_logits(logits, mb)

        logits = jax.vmap(one)(stacked_params, obs_blocks, mask_blocks)
        logits = logits.reshape(e, -1)
        if deterministic:
            return masked_argmax(logits)
        return masked_sample(rng, logits)

    return act
