"""Model export/import: weights + JSON metadata sidecar.

Schema parity with the reference exporter (src/utils/model_export.py:47-128):
each export writes ``models/<run>/model_<iter:05d>.msgpack`` (flax
serialized variables, replacing torch ``state_dict`` .pt) plus
``model_<iter:05d>.json`` with the identical metadata layout::

    {"model_id", "iteration",
     "architecture": {"name", "params"},
     "export_timestamp", "is_benchmark_breaker", "run_name"}

``load_any_model`` reconstructs the module from the registry and restores
weights without knowing the architecture beforehand (reference :149-179 —
the torch version strips ``_orig_mod.`` compile prefixes; no equivalent
artifact exists for jitted flax modules).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from datetime import datetime
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import serialization

from ..models.registry import create_model_from_architecture


@dataclass
class ModelMetadata:
    """Metadata stored alongside exported models (reference :47-85)."""

    model_id: str
    iteration: int
    architecture_name: str
    architecture_params: Dict[str, Any]
    export_timestamp: str
    is_benchmark_breaker: bool
    run_name: Optional[str]
    extra: Optional[Dict[str, Any]] = None

    def to_dict(self) -> Dict[str, Any]:
        return {
            "model_id": self.model_id,
            "iteration": self.iteration,
            "architecture": {
                "name": self.architecture_name,
                "params": self.architecture_params,
            },
            "export_timestamp": self.export_timestamp,
            "is_benchmark_breaker": self.is_benchmark_breaker,
            "run_name": self.run_name,
        }

    @classmethod
    def from_dict(cls, data: Dict[str, Any]) -> "ModelMetadata":
        architecture = data.get("architecture", {})
        return cls(
            model_id=data["model_id"],
            iteration=data.get("iteration", 0),
            architecture_name=architecture.get("name"),
            architecture_params=architecture.get("params", {}),
            export_timestamp=data.get("export_timestamp", ""),
            is_benchmark_breaker=data.get("is_benchmark_breaker", False),
            run_name=data.get("run_name"),
        )


class NullModelExporter:
    """Export facade for non-coordinator processes in multi-host runs: the
    train loop calls export at the same points on every process, but only
    process 0 touches the filesystem (parallel/mesh.py is_coordinator)."""

    def __init__(self, run_name: Optional[str] = None, base_dir: str = "models"):
        self.run_name = run_name
        self.export_dir = os.path.join(base_dir, run_name or "null")

    def export_model(self, *args, **kwargs) -> str:
        return ""


class ModelExporter:
    """Writes weight+metadata pairs under ``models/<run>/`` (reference :88-128)."""

    def __init__(self, run_name: Optional[str] = None, base_dir: str = "models"):
        self.run_name = run_name or datetime.now().strftime("%Y%m%d_%H%M%S")
        self.export_dir = os.path.join(base_dir, self.run_name)
        os.makedirs(self.export_dir, exist_ok=True)

    def export_model(
        self,
        variables: dict,
        architecture_name: str,
        architecture_params: Dict[str, Any],
        iteration: int,
        is_benchmark_breaker: bool = False,
    ) -> str:
        model_id = f"model_{iteration:05d}"
        model_path = os.path.join(self.export_dir, f"{model_id}.msgpack")
        metadata_path = os.path.join(self.export_dir, f"{model_id}.json")

        with open(model_path, "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(variables)))

        metadata = ModelMetadata(
            model_id=model_id,
            iteration=iteration,
            architecture_name=architecture_name,
            architecture_params=architecture_params,
            export_timestamp=datetime.now().isoformat(),
            is_benchmark_breaker=is_benchmark_breaker,
            run_name=self.run_name,
        )
        with open(metadata_path, "w") as f:
            json.dump(metadata.to_dict(), f, indent=2)

        print(
            f"Exported model {model_id} (architecture: {architecture_name}) "
            f"to {model_path}"
        )
        return model_id


def load_any_model(
    model_dir: str, model_id: str, dtype: Any = jnp.float32
) -> Tuple[Any, dict, ModelMetadata]:
    """Load (module, variables, metadata) from a directory (reference :149-179)."""
    metadata_path = os.path.join(model_dir, f"{model_id}.json")
    if not os.path.exists(metadata_path):
        raise FileNotFoundError(
            f"Metadata for model {model_id} not found in {model_dir}"
        )
    with open(metadata_path) as f:
        metadata = ModelMetadata.from_dict(json.load(f))

    model_path = os.path.join(model_dir, f"{model_id}.msgpack")
    if not os.path.exists(model_path):
        raise FileNotFoundError(f"Model weights {model_id} not found in {model_dir}")

    obs_shape = tuple(metadata.architecture_params["obs_shape"])
    action_dim = metadata.architecture_params["action_dim"]
    module, _ = create_model_from_architecture(
        metadata.architecture_name, obs_shape, action_dim, dtype=dtype
    )
    # Only the pytree STRUCTURE is needed to deserialize — eval_shape builds
    # it with zero device work, where an actual init would compile and run
    # an orthogonal-init program per architecture (10-40 s per remote
    # compile on the tunnel backend) just to overwrite every value.
    dummy = jnp.zeros((1,) + obs_shape, jnp.float32)
    template = dict(
        jax.eval_shape(
            lambda r: module.init(r, dummy, train=False), jax.random.PRNGKey(0)
        )
    )
    template.setdefault("batch_stats", {})
    with open(model_path, "rb") as f:
        variables = serialization.from_bytes(template, f.read())
    return module, variables, metadata


def get_models_from_directory(model_dir: str) -> List[Dict[str, Any]]:
    """List all model metadata dicts in a directory, sorted by iteration
    (reference :182-204)."""
    models: List[Dict[str, Any]] = []
    if not os.path.exists(model_dir):
        return models
    for filename in os.listdir(model_dir):
        if not filename.endswith(".json"):
            continue
        try:
            with open(os.path.join(model_dir, filename)) as f:
                metadata_dict = json.load(f)
            models.append(ModelMetadata.from_dict(metadata_dict).to_dict())
        except (json.JSONDecodeError, FileNotFoundError, KeyError, TypeError):
            # Not a model sidecar (stray config.json, partial write, ...) —
            # skip it instead of aborting the whole discovery.
            continue
    models.sort(key=lambda x: x.get("iteration", 0))
    return models
