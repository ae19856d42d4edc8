"""Unit tests for the masked-categorical primitives (ops/masked.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from rl_selfplay_mnk_tpu.ops.masked import (
    entropy,
    log_prob,
    mask_logits,
    masked_argmax,
    masked_sample,
    random_masked_actions,
)


def test_mask_logits_blocks_illegal_and_patches_degenerate():
    logits = jnp.array([[1.0, 2.0, 3.0], [1.0, 2.0, 3.0]])
    mask = jnp.array([[True, False, True], [False, False, False]])
    out = np.asarray(mask_logits(logits, mask))
    assert out[0, 1] == -np.inf and out[0, 0] == 1.0
    np.testing.assert_array_equal(out[1], np.zeros(3))  # uniform fallback


def test_log_prob_and_entropy_match_manual():
    logits = jnp.array([[0.5, -1.0, 2.0, 0.0]])
    mask = jnp.array([[True, True, False, True]])
    ml = mask_logits(logits, mask)
    z = np.asarray(ml[0], dtype=np.float64)
    finite = np.isfinite(z)
    p = np.zeros_like(z)
    p[finite] = np.exp(z[finite] - z[finite].max())
    p /= p.sum()
    lp = np.asarray(log_prob(ml, jnp.array([0])))
    assert np.isclose(lp[0], np.log(p[0]), atol=1e-6)
    ent = np.asarray(entropy(ml))
    manual = -(p[finite] * np.log(p[finite])).sum()
    assert np.isclose(ent[0], manual, atol=1e-6)


def test_masked_sample_frequencies():
    logits = jnp.log(jnp.array([[0.7, 0.2, 0.1]]))
    mask = jnp.ones((1, 3), bool)
    ml = mask_logits(jnp.tile(logits, (4096, 1)), jnp.tile(mask, (4096, 1)))
    acts = np.asarray(masked_sample(jax.random.PRNGKey(0), ml))
    freqs = np.bincount(acts, minlength=3) / len(acts)
    np.testing.assert_allclose(freqs, [0.7, 0.2, 0.1], atol=0.03)


def test_masked_sample_never_illegal():
    rng = np.random.default_rng(0)
    mask = jnp.asarray(rng.random((512, 9)) < 0.3)
    mask = mask.at[:, 4].set(True)  # ensure at least one legal everywhere
    logits = jnp.asarray(rng.normal(size=(512, 9)).astype(np.float32))
    ml = mask_logits(logits, mask)
    acts = np.asarray(masked_sample(jax.random.PRNGKey(1), ml))
    assert np.asarray(mask)[np.arange(512), acts].all()


def test_masked_argmax_and_random_actions():
    logits = jnp.array([[5.0, 1.0, 9.0]])
    mask = jnp.array([[True, True, False]])
    ml = mask_logits(logits, mask)
    assert int(masked_argmax(ml)[0]) == 0

    # random legal only
    mask2 = jnp.asarray(np.array([[False, True, False, True]] * 256))
    acts = np.asarray(random_masked_actions(jax.random.PRNGKey(2), mask2))
    assert set(np.unique(acts)) <= {1, 3}
    # deterministic = first legal
    det = np.asarray(random_masked_actions(None, mask2, deterministic=True))
    assert (det == 1).all()


def test_entropy_gradient_finite_through_mask():
    def f(logits):
        ml = mask_logits(logits, jnp.array([[True, False, True]]))
        return entropy(ml).sum()

    g = jax.grad(f)(jnp.array([[1.0, 2.0, 3.0]]))
    assert np.isfinite(np.asarray(g)).all()
    assert float(g[0, 1]) == 0.0  # masked entry receives no gradient
