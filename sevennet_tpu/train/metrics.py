"""Streaming error metrics (the reference's ``ErrorRecorder``,
``sevenn/error_recorder.py``): RMSE (vector-norm and per-component), MAE,
loss — accumulated as (sum, count) pairs so they stream over batches and
reduce across data-parallel devices with a single ``psum``.

Jit-friendly: each update returns a small accumulator pytree.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..data.graph import GraphBatch
from .loss import TO_KBAR

__all__ = ["MetricsAccumulator", "metrics_update", "metrics_finalize", "empty_accumulator"]

# accumulator: dict metric_name -> (sum, count)


def empty_accumulator() -> Dict[str, jnp.ndarray]:
    names = [
        "energy_rmse", "energy_mae", "force_rmse", "force_rmse_comp",
        "force_mae", "stress_rmse", "stress_mae",
    ]
    return {n: jnp.zeros(2, jnp.float64 if False else jnp.float32) for n in names}


def _acc(acc, name, sq_or_abs_sum, count):
    acc[name] = acc[name] + jnp.stack([sq_or_abs_sum, count])
    return acc


def metrics_update(
    acc: Dict[str, jnp.ndarray], out: Dict[str, jnp.ndarray], graph: GraphBatch
):
    dtype = out["energy"].dtype
    # energy per atom
    n_at = jnp.maximum(graph.num_atoms.astype(dtype), 1.0)
    e_mask = (graph.graph_mask & ~jnp.isnan(graph.energy)).astype(dtype)
    e_err = (out["energy"] - jnp.where(e_mask > 0, graph.energy, 0.0)) / n_at * e_mask
    acc = _acc(acc, "energy_rmse", jnp.sum(e_err**2), jnp.sum(e_mask))
    acc = _acc(acc, "energy_mae", jnp.sum(jnp.abs(e_err)), jnp.sum(e_mask))

    # force: the reference's default Force RMSE is VECTOR RMSE —
    # sqrt(mean over atoms of |dF|^2) (RMSError vdim=3,
    # error_recorder.py:167-180). Component RMSE kept as force_rmse_comp.
    f_mask = (graph.atom_mask[:, None] & ~jnp.isnan(graph.forces)).astype(dtype)
    f_err = (out["forces"] - jnp.where(f_mask > 0, graph.forces, 0.0)) * f_mask
    f_atoms = jnp.sum(jnp.max(f_mask, axis=1))
    acc = _acc(acc, "force_rmse", jnp.sum(f_err**2), f_atoms)
    acc = _acc(acc, "force_rmse_comp", jnp.sum(f_err**2), jnp.sum(f_mask))
    acc = _acc(acc, "force_mae", jnp.sum(jnp.abs(f_err)), jnp.sum(f_mask))

    if "stress" in out and graph.stress is not None:
        # vector RMSE over the 6 voigt components per structure (vdim=6)
        s_mask = (graph.graph_mask[:, None] & ~jnp.isnan(graph.stress)).astype(dtype)
        s_err = (
            (out["stress"] - jnp.where(s_mask > 0, graph.stress, 0.0))
            * s_mask * TO_KBAR
        )
        s_structs = jnp.sum(jnp.max(s_mask, axis=1))
        acc = _acc(acc, "stress_rmse", jnp.sum(s_err**2), s_structs)
        acc = _acc(acc, "stress_mae", jnp.sum(jnp.abs(s_err)), jnp.sum(s_mask))
    return acc


def metrics_finalize(acc: Dict[str, jnp.ndarray]) -> Dict[str, float]:
    out = {}
    for name, v in acc.items():
        s, c = float(v[0]), float(v[1])
        if c <= 0:
            out[name] = float("nan")
        elif name.endswith("rmse"):
            out[name] = float(np.sqrt(s / c))
        else:
            out[name] = s / c
    return out


@dataclass
class MetricsAccumulator:
    """Host-side convenience wrapper."""

    acc: Dict = field(default_factory=empty_accumulator)

    def update(self, out, graph):
        self.acc = metrics_update(self.acc, out, graph)

    def compute(self) -> Dict[str, float]:
        return metrics_finalize(self.acc)

    def reset(self):
        self.acc = empty_accumulator()
