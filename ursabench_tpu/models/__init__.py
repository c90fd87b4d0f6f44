"""Model zoo registry (parity with /root/reference/URSABench/models/__init__.py
plus baseline extras). Lookup by name via ``get_model`` mirrors the
reference's ``getattr(models, name)`` reflection (experiment.py:52)."""

from .common import ModelCfg, dropout_twin, get_model, list_models, register

# importing the family modules populates the registry
from . import mlp  # noqa: F401
from . import lenet  # noqa: F401
from . import resnet_cifar  # noqa: F401
from . import preresnet  # noqa: F401
from . import wideresnet  # noqa: F401
from . import resnet_imagenet  # noqa: F401

__all__ = ["ModelCfg", "get_model", "list_models", "register", "dropout_twin"]
