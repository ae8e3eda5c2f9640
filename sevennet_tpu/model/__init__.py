from .build import DEFAULT_MODEL_CONFIG, ModelSpec, build_model_spec
from .model import SevenNetTPU, model_init, model_compute

__all__ = [
    "DEFAULT_MODEL_CONFIG",
    "ModelSpec",
    "build_model_spec",
    "SevenNetTPU",
    "model_init",
    "model_compute",
]
