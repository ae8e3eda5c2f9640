"""Losses: per-atom energy, force, stress — with NaN-label masking.

Mirrors the reference semantics (``sevenn/train/loss.py``):
- energy loss on E/N_atoms (``PerAtomEnergyLoss``);
- force loss per component;
- stress loss in kbar (x 1602.1766208 from eV/A^3, ``loss.py:185``);
- labels that are NaN are excluded from both numerator and denominator
  (``_ignore_unlabeled``, ``loss.py:49-60``) — here via masks instead of
  boolean indexing (static shapes);
- criterion: MSE or Huber (``train/optim.py:23``);
- optional per-structure data weights (``loss.py:115-120``).

All pure JAX, jit/grad-safe, padded-graph aware.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax.numpy as jnp

from ..data.graph import GraphBatch

__all__ = ["LossConfig", "compute_losses", "TO_KBAR"]

TO_KBAR = 1602.1766208  # eV/A^3 -> kbar


@dataclass(frozen=True)
class LossConfig:
    criterion: str = "mse"  # 'mse' | 'huber'
    huber_delta: float = 0.01
    energy_weight: float = 1.0
    force_weight: float = 0.1
    stress_weight: float = 1e-6
    train_stress: bool = True
    use_weight: bool = False  # per-structure data weights (GraphBatch.data_weight)


def _criterion(cfg: LossConfig, pred, ref):
    err = pred - ref
    if cfg.criterion == "mse":
        return err * err
    if cfg.criterion == "huber":
        a = jnp.abs(err)
        d = cfg.huber_delta
        return jnp.where(a < d, 0.5 * err * err, d * (a - 0.5 * d))
    raise ValueError(cfg.criterion)


def _masked_mean(x, mask, weight=None):
    """Mean over masked entries; optional per-entry weights multiply the
    numerator only (reference semantics: ``mean(criterion * w)``,
    loss.py:79-80)."""
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    num = x * mask if weight is None else x * mask * weight
    return jnp.sum(num) / denom


def compute_losses(
    out: Dict[str, jnp.ndarray], graph: GraphBatch, cfg: LossConfig
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (total_loss, per-term dict). NaN labels contribute zero."""
    losses: Dict[str, jnp.ndarray] = {}
    dtype = out["energy"].dtype

    if cfg.use_weight and graph.data_weight is not None:
        w_e = graph.data_weight[:, 0]
        w_f = graph.data_weight[:, 1][graph.batch]
        w_s = graph.data_weight[:, 2]
    else:
        w_e = w_f = w_s = None

    # energy, per atom
    e_ref = graph.energy
    n_at = jnp.maximum(graph.num_atoms.astype(dtype), 1.0)
    e_mask = (graph.graph_mask & ~jnp.isnan(e_ref)).astype(dtype)
    e_ref_safe = jnp.where(e_mask > 0, e_ref, 0.0)
    e_loss = _masked_mean(
        _criterion(cfg, out["energy"] / n_at, e_ref_safe / n_at), e_mask, w_e
    )
    losses["energy"] = e_loss

    # forces, per component
    f_ref = graph.forces
    f_mask = (graph.atom_mask[:, None] & ~jnp.isnan(f_ref)).astype(dtype)
    f_ref_safe = jnp.where(f_mask > 0, f_ref, 0.0)
    f_pred_safe = jnp.where(f_mask > 0, out["forces"], 0.0)
    f_loss = _masked_mean(
        _criterion(cfg, f_pred_safe, f_ref_safe), f_mask,
        None if w_f is None else w_f[:, None],
    )
    losses["force"] = f_loss

    total = cfg.energy_weight * e_loss + cfg.force_weight * f_loss

    if cfg.train_stress and "stress" in out:
        s_ref = graph.stress
        s_mask = (graph.graph_mask[:, None] & ~jnp.isnan(s_ref)).astype(dtype)
        s_ref_safe = jnp.where(s_mask > 0, s_ref, 0.0) * TO_KBAR
        s_pred_safe = jnp.where(s_mask > 0, out["stress"], 0.0) * TO_KBAR
        s_loss = _masked_mean(
            _criterion(cfg, s_pred_safe, s_ref_safe), s_mask,
            None if w_s is None else w_s[:, None],
        )
        losses["stress"] = s_loss
        total = total + cfg.stress_weight * s_loss

    losses["total"] = total
    return total, losses
