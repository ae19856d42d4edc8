"""BN-folding equivalence: folded variables must reproduce eval-mode
forwards exactly (up to float tolerance) for every BN-carrying architecture."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rl_selfplay_mnk_tpu.models.fold_bn import fold_batchnorm
from rl_selfplay_mnk_tpu.models.registry import (
    create_model_from_architecture,
    init_network,
    make_apply_fns,
)


@pytest.mark.parametrize("name", ["cnn_b_s", "cnn_b_l", "resnet_b_s", "resnet_b_l"])
def test_fold_bn_eval_equivalence(name):
    module, _ = create_model_from_architecture(name, (2, 5, 5), 25)
    variables = init_network(module, (2, 5, 5), jax.random.PRNGKey(0))

    # push running stats away from init so the fold is non-trivial
    eval_apply, train_apply = make_apply_fns(module)
    obs_train = jax.random.normal(jax.random.PRNGKey(1), (32, 2, 5, 5)) * 2 + 0.5
    _, bs = train_apply(variables, obs_train)
    variables = {"params": variables["params"], "batch_stats": bs}

    folded = jax.jit(fold_batchnorm)(variables)
    obs = jax.random.normal(jax.random.PRNGKey(2), (8, 2, 5, 5))
    l1, v1 = eval_apply(variables, obs)
    l2, v2 = eval_apply(folded, obs)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=2e-4, atol=2e-4)


def test_fold_bn_noop_for_transformer():
    module, _ = create_model_from_architecture("transformer_b_s", (2, 5, 5), 25)
    variables = init_network(module, (2, 5, 5), jax.random.PRNGKey(0))
    folded = fold_batchnorm(variables)
    for a, b in zip(jax.tree.leaves(variables["params"]), jax.tree.leaves(folded["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
