from .constants import (
    PLAYER_BLACK,
    PLAYER_WHITE,
    CHANNEL_ME,
    CHANNEL_ENEMY,
    REWARD_WIN,
    REWARD_LOSS,
    REWARD_DRAW,
)
from .mnk_env import (
    EnvConfig,
    EnvState,
    make_env_state,
    reset_where,
    observe,
    action_mask,
    step,
    check_wins,
    validate_step_inputs,
)

__all__ = [
    "PLAYER_BLACK",
    "PLAYER_WHITE",
    "CHANNEL_ME",
    "CHANNEL_ENEMY",
    "REWARD_WIN",
    "REWARD_LOSS",
    "REWARD_DRAW",
    "EnvConfig",
    "EnvState",
    "make_env_state",
    "reset_where",
    "observe",
    "action_mask",
    "step",
    "check_wins",
    "validate_step_inputs",
]
