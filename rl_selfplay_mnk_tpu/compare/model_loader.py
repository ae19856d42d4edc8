"""Tournament model discovery + lazy loading.

Parity with the reference loader (src/model_comparison/model_loader.py:
31-97): accepts files / directories / globs, dedups by (run_name,
iteration), loads weights lazily and can unload them. The torch version
shuttles modules between GPU/CPU/freed to control VRAM (:31-52); here
"loaded" means a (module, variables, policy_act) triple on device, and
unloading drops the references so jax frees the buffers.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field
from typing import Any, List, Optional, Tuple

from ..models.fold_bn import fold_batchnorm
from ..models.registry import make_apply_fns
from ..selfplay.policies import make_network_policy
from ..utils.model_export import ModelMetadata, get_models_from_directory, load_any_model


@dataclass
class ModelInfo:
    model_dir: str
    model_id: str
    run_name: str
    iteration: int
    architecture_name: str
    metadata: Optional[ModelMetadata] = None
    _loaded: Optional[Tuple[Any, dict, Any]] = field(default=None, repr=False)

    @property
    def unique_id(self) -> str:
        return f"{self.run_name}/{self.model_id}"

    def load_model(self) -> Tuple[Any, dict, Any]:
        """Returns (module, variables, policy_act). Cached until unload."""
        if self._loaded is None:
            from ..utils.hardware import detect_hardware_config

            # Match the training-time eval path: bf16 compute on TPU (params
            # stay f32) — an f32 tournament forward would halve MXU
            # throughput and score in a different numeric regime than the
            # validation forwards the models were promoted under.
            module, variables, metadata = load_any_model(
                self.model_dir,
                self.model_id,
                dtype=detect_hardware_config().compute_dtype,
            )
            self.metadata = metadata
            # Tournament policies are eval-mode: fold BatchNorm into the
            # convs so match play skips every norm op.
            variables = fold_batchnorm(variables)
            eval_apply, _ = make_apply_fns(module)
            self._loaded = (module, variables, make_network_policy(eval_apply))
        return self._loaded

    def unload_model(self, hard: bool = False) -> None:
        del hard  # single memory tier in jax — drop references either way
        self._loaded = None


class ModelLoader:
    """Collects ModelInfo entries from a mix of path specs (reference :61-97)."""

    def load_from_paths(self, paths: List[str]) -> List[ModelInfo]:
        models: List[ModelInfo] = []
        seen = set()
        for spec in paths:
            for path in sorted(glob.glob(spec)) or [spec]:
                if os.path.isdir(path):
                    for meta in get_models_from_directory(path):
                        info = self._info_from_meta(path, meta)
                        if info and (info.run_name, info.iteration) not in seen:
                            seen.add((info.run_name, info.iteration))
                            models.append(info)
                elif os.path.isfile(path) and path.endswith(".msgpack"):
                    model_dir = os.path.dirname(path) or "."
                    model_id = os.path.basename(path)[: -len(".msgpack")]
                    meta_path = os.path.join(model_dir, f"{model_id}.json")
                    if not os.path.exists(meta_path):
                        continue
                    import json

                    with open(meta_path) as f:
                        meta = json.load(f)
                    info = self._info_from_meta(model_dir, meta)
                    if info and (info.run_name, info.iteration) not in seen:
                        seen.add((info.run_name, info.iteration))
                        models.append(info)
        models.sort(key=lambda x: (x.run_name, x.iteration))
        return models

    @staticmethod
    def _info_from_meta(model_dir: str, meta: dict) -> Optional[ModelInfo]:
        try:
            return ModelInfo(
                model_dir=model_dir,
                model_id=meta["model_id"],
                run_name=meta.get("run_name") or os.path.basename(model_dir),
                iteration=meta.get("iteration", 0),
                architecture_name=meta.get("architecture", {}).get("name", "?"),
            )
        except KeyError:
            return None
