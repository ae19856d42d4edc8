from .masked import (
    mask_logits,
    masked_sample,
    masked_argmax,
    log_prob,
    entropy,
    random_masked_actions,
)

__all__ = [
    "mask_logits",
    "masked_sample",
    "masked_argmax",
    "log_prob",
    "entropy",
    "random_masked_actions",
]
