"""Model registry + the `model_cfg` convention, TPU-native edition.

The reference exposes config classes with ``.base/.args/.kwargs/
.transform_train/.transform_test`` looked up by ``getattr(models, name)``
(/root/reference/URSABench/models/__init__.py, experiment.py:52,71). Here a
``ModelCfg`` carries a flax module factory plus declarative ``ImageSpec``
transforms, and the registry is an explicit dict (no wildcard-import
reflection fragility).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict

import flax.linen as nn

from ..data.transforms import ImageSpec

_REGISTRY: Dict[str, "ModelCfg"] = {}


@dataclass(frozen=True)
class ModelCfg:
    name: str
    make: Callable[..., nn.Module]  # make(num_classes, **kwargs) -> module
    transform_train: ImageSpec
    transform_test: ImageSpec
    kwargs: dict = field(default_factory=dict)

    def build(self, num_classes: int, **overrides) -> nn.Module:
        kw = {**self.kwargs, **overrides}
        return self.make(num_classes=num_classes, **kw)


def register(cfg: ModelCfg) -> ModelCfg:
    _REGISTRY[cfg.name] = cfg
    return cfg


def get_model(name: str) -> ModelCfg:
    if name not in _REGISTRY:
        raise KeyError(
            f"Unknown model '{name}'. Available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def dropout_twin(name: str) -> ModelCfg:
    """Resolve the `<Name>_dropout` twin used by MCdropout
    (/root/reference/URSABench/inference/vi_dropout.py:13-22)."""
    return get_model(name + "_dropout")


def list_models():
    return sorted(_REGISTRY)
