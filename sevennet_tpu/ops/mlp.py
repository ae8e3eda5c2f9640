"""Scalar MLP (e3nn ``FullyConnectedNet`` equivalent) for radial weights.

Forward per hidden layer: ``x = act(x @ w / sqrt(h_in))`` with the
``normalize2mom``-scaled activation; final layer has no activation and the
same ``1/sqrt(h_in)`` scaling. Weights are stored as ``(h_in, h_out)``
matrices exactly like e3nn's ``layer{i}.weight`` checkpoint entries
(reference radial net: ``sevenn/nn/convolution.py:93-101``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .activations import NORMALIZED_ACTIVATION

__all__ = ["ScalarMLPSpec", "scalar_mlp_init", "scalar_mlp_apply"]


@dataclass(frozen=True)
class ScalarMLPSpec:
    dims: Tuple[int, ...]  # (in, hidden..., out)
    act: str = "silu"


def scalar_mlp_init(key, spec: ScalarMLPSpec, dtype=jnp.float32):
    keys = jax.random.split(key, len(spec.dims) - 1)
    ws = [
        jax.random.normal(k, (spec.dims[i], spec.dims[i + 1]), dtype=dtype)
        for i, k in enumerate(keys)
    ]
    return {"w": ws}


def scalar_mlp_apply(spec: ScalarMLPSpec, params, x):
    act = NORMALIZED_ACTIVATION[spec.act]
    n = len(params["w"])
    for i, w in enumerate(params["w"]):
        x = x @ (w / float(np.sqrt(w.shape[0])))
        if i < n - 1:
            x = act(x)
    return x
