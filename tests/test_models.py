"""Model-zoo tests: registry coverage, parameter-count parity with the
reference (SURVEY.md §2.2 measured table), forward contracts, BN semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rl_selfplay_mnk_tpu.models import (
    ARCHITECTURE_REGISTRY,
    create_model_from_architecture,
    init_network,
    make_apply_fns,
)

# Reference-measured parameter counts (obs (2,M,N), action_dim=M*N):
# SURVEY.md §2.2 — instantiated from the reference registry.
EXPECTED_PARAMS_9x9 = {
    "cnn_s": 198_011,
    "cnn_l": 1_751_675,
    "resnet_s": 383_291,
    "resnet_l": 2_453_819,
    "transformer_s": 429_179,
    "transformer_l": 2_326_331,
    "cnn_b_s": 129_459,
    "cnn_b_l": 670_235,
    "resnet_b_s": 118_203,
    "resnet_b_l": 665_627,
    "transformer_b_s": 124_531,
    "transformer_b_l": 652_859,
    "transformer_c_s": 137_299,
    "transformer_c_l": 745_979,
}

EXPECTED_PARAMS_13x13 = {
    "cnn_b_s": 175_131,
    "resnet_b_s": 163_875,
    "transformer_b_s": 175_131,
}

# Framework speed-tier extensions: parameter-matched to the budget tier but
# MXU-shaped (wider channels, shallower stacks) — registry.py comments.
SPEED_TIER_PARAMS_9x9 = {
    "resnet_b_s_w": ("resnet_b_s", 118_587),
    "resnet_b_l_w": ("resnet_b_l", 679_739),
    "transformer_b_s_w": ("transformer_b_s", 120_379),
    "transformer_b_l_w": ("transformer_b_l", 634_683),
}


def count_params(variables) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(variables["params"]))


def test_registry_has_all_14_names():
    # the reference's 14 names all present; extras are the documented
    # speed-tier variants + BASELINE config-1's tiny MLP only
    assert set(ARCHITECTURE_REGISTRY) == (
        set(EXPECTED_PARAMS_9x9) | set(SPEED_TIER_PARAMS_9x9) | {"mlp_tiny"}
    )


def test_mlp_tiny_contract():
    """BASELINE configs[0]'s tiny MLP: same head contract as every body
    (masked f32 logits, Tanh-bounded value), batch-stat-free, small."""
    module, _ = create_model_from_architecture("mlp_tiny", (2, 3, 3), 9)
    variables = init_network(module, (2, 3, 3), jax.random.PRNGKey(0))
    assert not jax.tree.leaves(variables.get("batch_stats", {}))
    assert count_params(variables) < 20_000
    logits, value = module.apply(
        {"params": variables["params"], "batch_stats": {}},
        jnp.zeros((4, 2, 3, 3)),
        train=False,
    )
    assert logits.shape == (4, 9) and logits.dtype == jnp.float32
    assert value.shape == (4, 1)
    assert float(jnp.abs(value).max()) <= 1.0


@pytest.mark.parametrize("name", sorted(SPEED_TIER_PARAMS_9x9))
def test_speed_tier_param_budget(name):
    base, expected = SPEED_TIER_PARAMS_9x9[name]
    module, _ = create_model_from_architecture(name, (2, 9, 9), 81)
    variables = init_network(module, (2, 9, 9), jax.random.PRNGKey(0))
    got = count_params(variables)
    assert got == expected
    # within 3.5% of the budget-tier base it substitutes for
    assert abs(got - EXPECTED_PARAMS_9x9[base]) / EXPECTED_PARAMS_9x9[base] < 0.035


@pytest.mark.parametrize("name", sorted(EXPECTED_PARAMS_9x9))
def test_param_count_parity_9x9(name):
    module, _ = create_model_from_architecture(name, (2, 9, 9), 81)
    variables = init_network(module, (2, 9, 9), jax.random.PRNGKey(0))
    assert count_params(variables) == EXPECTED_PARAMS_9x9[name]


@pytest.mark.parametrize("name", sorted(EXPECTED_PARAMS_13x13))
def test_param_count_parity_13x13(name):
    module, _ = create_model_from_architecture(name, (2, 13, 13), 169)
    variables = init_network(module, (2, 13, 13), jax.random.PRNGKey(0))
    assert count_params(variables) == EXPECTED_PARAMS_13x13[name]


@pytest.mark.parametrize(
    "name", ["cnn_b_s", "resnet_b_s", "transformer_b_s", "transformer_c_s"]
)
def test_forward_contract(name):
    m = n = 5
    module, _ = create_model_from_architecture(name, (2, m, n), m * n)
    variables = init_network(module, (2, m, n), jax.random.PRNGKey(0))
    eval_apply, train_apply = make_apply_fns(module)
    obs = jnp.zeros((4, 2, m, n), jnp.float32)

    logits, value = eval_apply(variables, obs)
    assert logits.shape == (4, m * n) and logits.dtype == jnp.float32
    assert value.shape == (4, 1) and value.dtype == jnp.float32
    assert (jnp.abs(value) <= 1.0).all()  # tanh-bounded critic

    (logits2, value2), new_bs = train_apply(variables, obs)
    assert logits2.shape == (4, m * n)
    # BN bodies must produce updated batch_stats, transformer bodies none.
    if name.startswith(("cnn", "resnet")):
        assert jax.tree.leaves(new_bs)
    else:
        assert not jax.tree.leaves(new_bs)


def test_actor_head_near_uniform_at_init():
    # gain 0.01 on the last actor linear -> near-zero logits at init
    module, _ = create_model_from_architecture("resnet_b_s", (2, 5, 5), 25)
    variables = init_network(module, (2, 5, 5), jax.random.PRNGKey(0))
    eval_apply, _ = make_apply_fns(module)
    obs = jax.random.normal(jax.random.PRNGKey(1), (8, 2, 5, 5))
    logits, _ = eval_apply(variables, obs)
    assert float(jnp.abs(logits).max()) < 0.5


def test_bn_train_eval_differ_and_stats_update():
    module, _ = create_model_from_architecture("cnn_b_s", (2, 5, 5), 25)
    variables = init_network(module, (2, 5, 5), jax.random.PRNGKey(0))
    eval_apply, train_apply = make_apply_fns(module)
    obs = jax.random.normal(jax.random.PRNGKey(1), (16, 2, 5, 5)) * 3 + 1

    (lt, _), new_bs = train_apply(variables, obs)
    le, _ = eval_apply(variables, obs)
    assert not np.allclose(np.asarray(lt), np.asarray(le))
    # running stats moved toward the batch statistics
    old_leaves = jax.tree.leaves(variables["batch_stats"])
    new_leaves = jax.tree.leaves(new_bs)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(old_leaves, new_leaves)
    )


def test_bf16_compute_path():
    module, _ = create_model_from_architecture(
        "resnet_b_s", (2, 5, 5), 25, dtype=jnp.bfloat16
    )
    variables = init_network(module, (2, 5, 5), jax.random.PRNGKey(0))
    eval_apply, _ = make_apply_fns(module)
    logits, value = eval_apply(variables, jnp.zeros((2, 2, 5, 5)))
    # params stay f32, outputs come back f32
    assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(variables["params"]))
    assert logits.dtype == jnp.float32 and value.dtype == jnp.float32
