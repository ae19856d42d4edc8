from .registry import (
    ARCHITECTURE_REGISTRY,
    create_model_from_architecture,
    init_network,
    make_apply_fns,
)
from .cnn import CnnActorCritic
from .resnet import ResNetActorCritic
from .transformer import TransformerActorCritic
from .sgr_transformer import SGRTransformerActorCritic

__all__ = [
    "ARCHITECTURE_REGISTRY",
    "create_model_from_architecture",
    "init_network",
    "make_apply_fns",
    "CnnActorCritic",
    "ResNetActorCritic",
    "TransformerActorCritic",
    "SGRTransformerActorCritic",
]
