from .gae import compute_gae
from .schedules import make_lr_schedule, entropy_coef_at
from .ppo import PPOConfig, PPOLearner, TrainingMetrics

__all__ = [
    "compute_gae",
    "make_lr_schedule",
    "entropy_coef_at",
    "PPOConfig",
    "PPOLearner",
    "TrainingMetrics",
]
