"""Architecture registry: the reference's 14 names -> flax module factories.

Parity with ``ARCHITECTURE_REGISTRY`` (reference src/utils/model_export.py:
29-44) and the per-name configurations measured in SURVEY.md §2.2:

  originals     : cnn_{s,l}, resnet_{s,l}, transformer_{s,l}
  budget tier   : cnn_b_{s,l}, resnet_b_{s,l}, transformer_b_{s,l}
                  (parameter-matched across families; the tier all the
                  reference experiment scripts train)
  SGR gated     : transformer_c_{s,l}
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from .cnn import CnnActorCritic
from .mlp import MlpActorCritic
from .resnet import ResNetActorCritic
from .transformer import TransformerActorCritic
from .sgr_transformer import SGRTransformerActorCritic


def _cnn(channels, hidden):
    return lambda action_dim, dtype: CnnActorCritic(
        action_dim=action_dim, channels=tuple(channels), head_hidden=hidden, dtype=dtype
    )


def _resnet(channels, blocks, hidden):
    return lambda action_dim, dtype: ResNetActorCritic(
        action_dim=action_dim, channels=channels, num_blocks=blocks,
        head_hidden=hidden, dtype=dtype,
    )


def _tfm(d, layers, heads, hidden, ffn=None, qkv=None):
    return lambda action_dim, dtype: TransformerActorCritic(
        action_dim=action_dim, embed_dim=d, num_layers=layers, num_heads=heads,
        head_hidden=hidden, dtype=dtype, ffn_dim=ffn, qkv_features=qkv,
    )


def _sgr(d, layers, heads, hidden):
    return lambda action_dim, dtype: SGRTransformerActorCritic(
        action_dim=action_dim, embed_dim=d, num_layers=layers, num_heads=heads,
        head_hidden=hidden, dtype=dtype,
    )


# name -> factory(action_dim, dtype) -> nn.Module
# Configs per reference: cnn.py:83-110, resnet.py:98-115, transformer.py:
# 94-111, configs.py:7-66, sgrtransformer.py:138-157.
ARCHITECTURE_REGISTRY: Dict[str, Callable] = {
    "cnn_s": _cnn([64] * 4, 256),
    "cnn_l": _cnn([192] * 6, 256),
    "resnet_s": _resnet(64, 4, 256),
    "resnet_l": _resnet(128, 8, 256),
    "transformer_s": _tfm(96, 3, 3, 256),
    "transformer_l": _tfm(192, 5, 6, 256),
    "cnn_b_s": _cnn([56] * 4, 128),
    "cnn_b_l": _cnn([96] * 8, 256),
    "resnet_b_s": _resnet(32, 4, 128),
    "resnet_b_l": _resnet(80, 5, 256),
    "transformer_b_s": _tfm(56, 2, 4, 128),
    "transformer_b_l": _tfm(96, 5, 8, 256),
    "transformer_c_s": _sgr(56, 2, 4, 128),
    "transformer_c_l": _sgr(96, 5, 8, 256),
    # Speed tier (framework extension beyond the reference's 14 names):
    # parameter-matched but MXU-shaped. resnet_b_s's 32-channel convs leave
    # 75% of the 128-wide MXU output dimension idle (PERFORMANCE.md ceiling
    # analysis); the _w variants spend the same parameter budget on wider,
    # shallower stacks that pad the systolic array far better.
    "resnet_b_s_w": _resnet(64, 1, 128),  # 118,587 params @9x9 (b_s: 118,203)
    "resnet_b_l_w": _resnet(128, 2, 256),  # 679,739 params @9x9 (b_l: 665,627)
    # Transformer speed tier: transformer_b_s's d=56 GEMMs fill only 44% of
    # the 128-wide MXU lane dimension; these respend the same budget on
    # d=128/256 projections (full lanes), one layer instead of 2/5. Few fat
    # heads: the attention kernel's scores matmul contracts over head_dim,
    # so dh=64 fills the MXU 4x better than dh=16 (measured H2 beats H8 by
    # 22% on the full update step — tools/attn_kernel_ablation.py).
    "transformer_b_s_w": _tfm(128, 1, 2, 128, ffn=0),
    "transformer_b_l_w": _tfm(256, 1, 4, 256, ffn=512),
    # BASELINE configs[0]'s "tiny MLP policy" (3x3x3 / 64 envs / PPO vs
    # random) — extension, no reference counterpart (models/mlp.py).
    "mlp_tiny": lambda action_dim, dtype: MlpActorCritic(
        action_dim=action_dim, dtype=dtype
    ),
}


def create_model_from_architecture(
    architecture_name: str,
    obs_shape: Tuple[int, int, int],
    action_dim: int,
    dtype: Any = jnp.float32,
):
    """Instantiate a registered architecture (reference model_export.py:140-146).

    Returns ``(module, architecture_params)`` where ``architecture_params``
    is the JSON-serializable ctor record stored in export metadata.
    """
    if architecture_name not in ARCHITECTURE_REGISTRY:
        raise ValueError(
            f"Unknown architecture: {architecture_name}. Known architectures: "
            + ", ".join(sorted(ARCHITECTURE_REGISTRY))
        )
    module = ARCHITECTURE_REGISTRY[architecture_name](action_dim, dtype)
    arch_params = {
        "obs_shape": [int(x) for x in obs_shape],
        "action_dim": int(action_dim),
    }
    return module, arch_params


def init_network(module, obs_shape: Tuple[int, int, int], rng: jax.Array) -> dict:
    """Initialize variables with a dummy batch.

    Returns the full variables dict: {"params": ..., "batch_stats": ...}
    (``batch_stats`` empty for norm-free bodies, kept for a uniform pytree
    contract across architectures).
    """
    dummy = jnp.zeros((1,) + tuple(obs_shape), jnp.float32)
    # One compiled program instead of per-parameter eager dispatches (which
    # crawl when every op is a network round-trip on the remote-TPU tunnel).
    variables = dict(
        jax.jit(lambda r: module.init(r, dummy, train=False))(rng)
    )
    variables.setdefault("batch_stats", {})
    return variables


@functools.lru_cache(maxsize=None)
def make_apply_fns(module):
    """Build the two apply flavors used across the framework.

    eval_apply(variables, observation, action_mask, train=False)
        -> (logits, value). Runs with running BN averages (reference
        NNPolicy eval mode, policy.py:34-35). ``action_mask`` is accepted
        for contract symmetry; masking is applied by the caller via
        ops.masked so the distribution math lives in one place.

    train_apply(variables, observation)
        -> ((logits, value), new_batch_stats). Batch-stat BN + running-stat
        update, mirroring the reference's train-mode forwards during both
        rollout and update (ppo.py:97-98, 195).
    """

    def eval_apply(variables, observation, action_mask=None, train=False):
        del action_mask, train
        return module.apply(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})},
            observation,
            train=False,
        )

    def train_apply(variables, observation):
        out, updated = module.apply(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})},
            observation,
            train=True,
            mutable=["batch_stats"],
        )
        return out, updated.get("batch_stats", {})

    return eval_apply, train_apply
