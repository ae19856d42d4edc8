from .policies import Policy, RandomPolicy, NNPolicy, make_network_policy
from .wrapper import (
    SelfPlayState,
    selfplay_reset,
    selfplay_step,
    canonical_obs,
)
from .opponent_pool import OpponentPool, DevicePool
from .validation import validate

__all__ = [
    "Policy",
    "RandomPolicy",
    "NNPolicy",
    "make_network_policy",
    "SelfPlayState",
    "selfplay_reset",
    "selfplay_step",
    "canonical_obs",
    "OpponentPool",
    "DevicePool",
    "validate",
]
