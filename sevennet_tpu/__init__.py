"""SevenNet-TPU: a TPU-native E(3)-equivariant GNN interatomic potential
framework with the capabilities of MDIL-SNU/SevenNet.

Lazy top-level API (imports stay light; heavy deps load on first use):

    from sevennet_tpu import SevenNetTPUCalculator
    calc = SevenNetTPUCalculator("7net-0")          # name / .pth / native

    from sevennet_tpu import MDEngine, load_model
    spec, params = load_model("checkpoint.pth")
    engine = MDEngine(spec, params, cell)
"""

__version__ = "0.2.0"

_LAZY = {
    "SevenNetTPUCalculator": ("sevennet_tpu.calculator", "SevenNetTPUCalculator"),
    "SevenNetD3Calculator": ("sevennet_tpu.calculator", "SevenNetD3Calculator"),
    "D3Calculator": ("sevennet_tpu.d3", "D3Calculator"),
    "MDEngine": ("sevennet_tpu.md", "MDEngine"),
    "DistributedMDEngine": ("sevennet_tpu.parallel.md", "DistributedMDEngine"),
    "load_model": ("sevennet_tpu.io.registry", "load_model"),
    "resolve_checkpoint": ("sevennet_tpu.io.registry", "resolve_checkpoint"),
    "build_model_spec": ("sevennet_tpu.model", "build_model_spec"),
    "Trainer": ("sevennet_tpu.train", "Trainer"),
}

__all__ = list(_LAZY) + ["__version__"]


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'sevennet_tpu' has no attribute {name!r}")
