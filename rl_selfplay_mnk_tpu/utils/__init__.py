from .model_export import (
    ModelMetadata,
    ModelExporter,
    load_any_model,
    get_models_from_directory,
)
from .metrics import MetricsLogger
from .checkpoint import save_checkpoint, restore_checkpoint, latest_checkpoint_step

__all__ = [
    "ModelMetadata",
    "ModelExporter",
    "load_any_model",
    "get_models_from_directory",
    "MetricsLogger",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_checkpoint_step",
]
