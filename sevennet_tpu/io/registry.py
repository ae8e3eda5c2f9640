"""Pretrained checkpoint registry: name -> path resolution + a universal
loader.

TPU counterpart of the reference's pretrained-model resolution
(``sevenn/util.py:264-359``, ``sevenn/_const.py:50-68``): the same model
names resolve through a search path of local directories. This image has no
network egress, so instead of auto-downloading we report the official
release URL and the directories searched; drop the ``.pth`` there once and
every API (calculator, CLI, MD engine) picks it up by name.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Any, Dict, List, Optional, Tuple

__all__ = [
    "resolve_checkpoint",
    "get_available_pretrained_models",
    "load_model",
]

_GIT = "https://github.com/MDIL-SNU/SevenNet/releases/download"

# canonical name -> (checkpoint basename, release URL or None)
_REGISTRY: Dict[str, Tuple[str, Optional[str]]] = {
    "sevennet-0": ("checkpoint_sevennet_0.pth", None),
    "sevennet-0_11jul2024": ("checkpoint_sevennet_0.pth", None),
    "sevennet-0_22may2024": ("checkpoint_sevennet_0_22May2024.pth", None),
    "sevennet-l3i5": ("checkpoint_l3i5.pth", None),
    "sevennet-mf-0": ("checkpoint_sevennet_mf_0.pth", None),
    "sevennet-mf-ompa": (
        "checkpoint_sevennet_mf_ompa.pth",
        f"{_GIT}/v0.11.0.cp/checkpoint_sevennet_mf_ompa.pth",
    ),
    "sevennet-omat": (
        "checkpoint_sevennet_omat.pth",
        f"{_GIT}/v0.11.0.cp/checkpoint_sevennet_omat.pth",
    ),
    "sevennet-omni": (
        "checkpoint_sevennet_omni.pth",
        f"{_GIT}/v0.12.0.cp/checkpoint_sevennet_omni.pth",
    ),
    "sevennet-omni-i8": (
        "checkpoint_sevennet_omni_i8.pth",
        f"{_GIT}/v0.12.1.cp/checkpoint_sevennet_omni_i8.pth",
    ),
    "sevennet-omni-i12": (
        "checkpoint_sevennet_omni_i12.pth",
        f"{_GIT}/v0.12.1.cp/checkpoint_sevennet_omni_i12.pth",
    ),
}


def _normalize(name: str) -> Optional[str]:
    n = name.lower().replace("7net", "sevennet")
    if n in _REGISTRY:
        return n
    return None


def _search_dirs() -> List[str]:
    dirs = []
    env = os.environ.get("SEVENN_TPU_CHECKPOINT_DIR")
    if env:
        dirs.append(env)
    dirs.append(osp.expanduser("~/.cache/sevennet_tpu"))
    dirs.append(osp.expanduser("~/.cache/sevennet"))
    return dirs


def get_available_pretrained_models() -> List[str]:
    return sorted(_REGISTRY)


def resolve_checkpoint(name_or_path: str) -> str:
    """Resolve a pretrained model name (or a filesystem path) to a
    checkpoint path. Searches ``$SEVENN_TPU_CHECKPOINT_DIR`` then
    ``~/.cache/sevennet_tpu`` and ``~/.cache/sevennet`` (both flat and one
    subdirectory deep, matching the reference's layout)."""
    if osp.exists(name_or_path):
        return name_or_path
    key = _normalize(name_or_path)
    if key is None:
        raise FileNotFoundError(
            f"'{name_or_path}' is neither an existing path nor a known "
            f"pretrained name; known: {', '.join(get_available_pretrained_models())}"
        )
    base, url = _REGISTRY[key]
    tried = []
    for d in _search_dirs():
        for cand in (osp.join(d, base), osp.join(d, key, base)):
            tried.append(cand)
            if osp.exists(cand):
                return cand
        # reference layout: SevenNet_0__11Jul2024/checkpoint_sevennet_0.pth
        if osp.isdir(d):
            for sub in sorted(os.listdir(d)):
                cand = osp.join(d, sub, base)
                if osp.exists(cand):
                    return cand
    hint = f" (official release: {url})" if url else ""
    raise FileNotFoundError(
        f"pretrained checkpoint '{key}' not found locally{hint}; searched "
        + ", ".join(tried)
        + " — place the file in $SEVENN_TPU_CHECKPOINT_DIR (no network "
        "egress available for auto-download)"
    )


def load_model(name_or_path, dtype=None) -> Tuple[Any, Dict[str, Any]]:
    """Universal loader -> (ModelSpec, params).

    Accepts: a pretrained name, a stock SevenNet ``.pth`` checkpoint, a
    native checkpoint directory, or a native ``model.msgpack`` path
    (reference analogue: ``util.model_from_checkpoint``, ``util.py:119-131``).
    """
    path = resolve_checkpoint(str(name_or_path))
    if osp.isdir(path) or path.endswith(".msgpack"):
        from .native_checkpoint import load_checkpoint

        spec, params, _meta = load_checkpoint(path)
        return spec, params
    from .torch_checkpoint import load_sevennet_checkpoint

    return load_sevennet_checkpoint(path, dtype=dtype)
