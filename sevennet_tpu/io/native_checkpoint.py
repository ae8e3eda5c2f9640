"""Native checkpoint format: msgpack params + JSON config in one directory.

The analogue of the reference's torch ``.pth`` checkpoints
(``sevenn/train/trainer.py:194-214``, ``sevenn/checkpoint.py``): stores the
full model config (so the model can be rebuilt exactly), parameters,
optional optimizer state, epoch counter and a uuid. ``load_checkpoint``
resolves either this native format or a stock SevenNet ``.pth``.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any, Dict, Optional, Tuple

import numpy as np

__all__ = ["save_checkpoint", "load_native_checkpoint", "load_checkpoint"]


def _to_numpy_tree(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str,
    model_config: Dict[str, Any],
    params,
    opt_state=None,
    epoch: int = 0,
    extra: Optional[Dict[str, Any]] = None,
):
    """``path`` is a directory; creates config.json + params.msgpack
    (+ opt_state.msgpack)."""
    from flax import serialization

    os.makedirs(path, exist_ok=True)
    meta = {
        "format": "sevennet_tpu.v1",
        "uuid": str(uuid.uuid4()),
        "epoch": int(epoch),
        "model_config": _jsonable(model_config),
    }
    if extra:
        meta["extra"] = _jsonable(extra)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(meta, f, indent=1, default=str)
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(_to_numpy_tree(params)))
    if opt_state is not None:
        with open(os.path.join(path, "opt_state.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(_to_numpy_tree(opt_state)))


def _jsonable(obj):
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj


def load_native_checkpoint(
    path: str, params_template=None, opt_state_template=None
) -> Tuple[Dict[str, Any], Any, Any, Dict[str, Any]]:
    """Returns (model_config, params, opt_state_or_None, meta)."""
    from flax import serialization

    with open(os.path.join(path, "config.json")) as f:
        meta = json.load(f)
    assert meta.get("format") == "sevennet_tpu.v1", "not a sevennet_tpu checkpoint"
    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        raw = f.read()
    if params_template is not None:
        params = serialization.from_bytes(params_template, raw)
    else:
        params = serialization.msgpack_restore(raw)
    opt_state = None
    op = os.path.join(path, "opt_state.msgpack")
    if os.path.exists(op):
        with open(op, "rb") as f:
            raw = f.read()
        if opt_state_template is not None:
            opt_state = serialization.from_bytes(opt_state_template, raw)
        else:
            opt_state = serialization.msgpack_restore(raw)
    return meta["model_config"], params, opt_state, meta


def _rebuild_params_lists(spec, params):
    """msgpack_restore returns dicts with string int keys for lists; convert
    back to lists ordered by index."""
    def fix(node):
        if isinstance(node, dict) and node and all(
            isinstance(k, str) and k.isdigit() for k in node
        ):
            return [fix(node[str(i)]) for i in range(len(node))]
        if isinstance(node, dict):
            return {k: fix(v) for k, v in node.items()}
        return node

    return fix(params)


def load_checkpoint(path: str):
    """Universal loader: native dir, or stock SevenNet .pth file.
    Returns (spec, params, meta)."""
    from ..model.build import build_model_spec

    if os.path.isdir(path):
        cfg, params, _, meta = load_native_checkpoint(path)
        spec = build_model_spec(cfg)
        params = _rebuild_params_lists(spec, params)
        import jax.numpy as jnp
        import jax

        params = jax.tree.map(jnp.asarray, params)
        return spec, params, meta
    from .torch_checkpoint import load_sevennet_checkpoint

    spec, params = load_sevennet_checkpoint(path)
    return spec, params, {"format": "sevenn_torch"}
