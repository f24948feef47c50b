"""Model registry with auto-import (reference: basicsr/models/__init__.py:19)."""

from ..registry import MODEL_REGISTRY, auto_import

auto_import(__name__, "_model")


def build_model(opt):
    model = MODEL_REGISTRY.get(opt["model_type"])(opt)
    return model
