"""BatchNorm folding for eval-mode (frozen-statistics) forwards.

Eval-mode BatchNorm is an affine transform with constants:

    y = (x - mu) / sqrt(var + eps) * gamma + beta

For a Conv -> BN pair this folds into the conv itself:

    W' = W * gamma / sqrt(var + eps)        (per output channel)
    b' = (b - mu) * gamma / sqrt(var + eps) + beta

Opponent, benchmark, validation and tournament policies all run eval-mode
(reference NNPolicy eval semantics, policy.py:34-35), so folding removes
every BN op — one fewer elementwise pass per conv and fewer kernels in the
rollout's opponent forward. Training forwards are untouched (they need
batch statistics).

Folded variables remain a valid parameter pytree for the SAME module: the
BN scale/bias become identity (gamma=1, beta=0) and running stats become
(mu=0, var=1-eps'), making the BN a no-op while the conv carries the fold.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-5


def _fold_layer(conv: Dict, bn_params: Dict, bn_stats: Dict) -> Tuple[Dict, Dict, Dict]:
    gamma = bn_params["scale"]
    beta = bn_params["bias"]
    mu = bn_stats["mean"]
    var = bn_stats["var"]
    inv = gamma / jnp.sqrt(var + _EPS)  # (C,)

    # A conv built with use_bias=False has no "bias" param; writing one into
    # the dict would be SILENTLY ignored by module.apply, dropping the whole
    # (b - mu)*inv + beta shift. Every conv in this zoo uses the flax
    # default use_bias=True — fail loudly if that ever changes.
    assert "bias" in conv, (
        "fold_batchnorm requires the conv to have a bias param "
        "(use_bias=True); a use_bias=False conv cannot absorb the BN shift"
    )
    kernel = conv["kernel"] * inv  # broadcast over trailing out-channel axis
    bias = (conv["bias"] - mu) * inv + beta
    new_conv = dict(conv, kernel=kernel, bias=bias)
    new_bn = dict(bn_params, scale=jnp.ones_like(gamma), bias=jnp.zeros_like(beta))
    new_stats = dict(bn_stats, mean=jnp.zeros_like(mu), var=jnp.ones_like(var) - _EPS)
    return new_conv, new_bn, new_stats


def _walk(params: Any, stats: Any):
    """Yield (container, conv_name, bn_name) for Conv_i/BatchNorm_i siblings."""
    if not isinstance(params, dict):
        return
    def num(name: str) -> int:
        return int(name.rsplit("_", 1)[1])

    convs = sorted((k for k in params if k.startswith("Conv_")), key=num)
    bns = sorted((k for k in params if k.startswith("BatchNorm_")), key=num)
    # flax auto-naming pairs Conv_i with BatchNorm_i within a module scope
    # for every body in this zoo (cnn.py / resnet.py define them adjacently).
    # CONTRACT: parameter names alone cannot prove which conv a BN follows
    # (a scope with a BN-free conv ahead of a conv+BN pair would still name
    # them Conv_0/Conv_1/BatchNorm_0); the idiom requires every conv in a
    # scope that has BNs to be BN-paired, enforced by the count check below
    # AND by tests/test_fold_bn.py, which asserts folded==unfolded eval
    # outputs numerically for EVERY registry architecture — extend that
    # test when adding a body.
    if bns:
        assert len(convs) == len(bns), (
            f"scope mixes BN-paired and bare convs ({convs} vs {bns}); "
            "fold_batchnorm only supports the uniform Conv_i+BatchNorm_i "
            "idiom — restructure the module or skip folding"
        )
    for conv_name, bn_name in zip(convs, bns):
        if isinstance(stats, dict) and bn_name in stats:
            yield params, stats, conv_name, bn_name
    for key, sub in params.items():
        if isinstance(sub, dict):
            yield from _walk(sub, stats.get(key, {}) if isinstance(stats, dict) else {})


def fold_batchnorm(variables: dict) -> dict:
    """Return a new variables dict with every eval-mode Conv->BN pair folded.

    Safe no-op for norm-free architectures (transformers).
    """
    params = jax.tree.map(lambda x: x, variables["params"])  # deep-ish copy
    stats = jax.tree.map(lambda x: x, variables.get("batch_stats", {}))

    for p_container, s_container, conv_name, bn_name in list(_walk(params, stats)):
        conv, bn, st = _fold_layer(
            p_container[conv_name], p_container[bn_name], s_container[bn_name]
        )
        p_container[conv_name] = conv
        p_container[bn_name] = bn
        s_container[bn_name] = st
    return {"params": params, "batch_stats": stats}
