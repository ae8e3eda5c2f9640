"""Optimizer and LR-schedule registries on optax.

Name-compatible with the reference registries (``sevenn/train/optim.py:5-23``):
optimizers sgd / adagrad / adam / adamw / radam; schedulers steplr /
multisteplr / exponentiallr / cosineannealinglr / linearlr /
reducelronplateau.

Trainability masks: the reference freezes/unfreezes bessel coefficients,
conv denominators and shift/scale via ``requires_grad``; here the same
effect comes from ``optax.masked`` zeroing updates for frozen leaves.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import optax

from ..model.build import ModelSpec

__all__ = ["build_optimizer", "build_schedule", "trainable_mask"]


def build_schedule(name: str, lr: float, param: Optional[Dict[str, Any]] = None):
    """Returns a host-side ``epoch -> lr`` callable.

    The reference steps its torch schedulers ONCE PER EPOCH
    (``scripts/processing_epoch.py`` + ``trainer.py:177-184``), so the
    schedule argument is the epoch counter, not the optimizer step.
    """
    param = dict(param or {})
    name = (name or "constant").lower()
    if name in ("constant", "none"):
        return lambda epoch: lr
    if name == "steplr":
        step_size = int(param.get("step_size", 1))
        gamma = float(param.get("gamma", 0.1))
        return lambda epoch: lr * gamma ** (epoch // step_size)
    if name == "multisteplr":
        milestones = sorted(int(m) for m in param.get("milestones", []))
        gamma = float(param.get("gamma", 0.1))
        return lambda epoch: lr * gamma ** sum(epoch >= m for m in milestones)
    if name == "exponentiallr":
        gamma = float(param.get("gamma", 0.99))
        return lambda epoch: lr * gamma**epoch
    if name == "cosineannealinglr":
        import math

        t_max = int(param.get("T_max", 100))
        eta_min = float(param.get("eta_min", 0.0))
        return lambda epoch: eta_min + 0.5 * (lr - eta_min) * (
            1.0 + math.cos(math.pi * min(epoch, t_max) / t_max)
        )
    if name == "linearlr":
        start = float(param.get("start_factor", 1.0))
        end = float(param.get("end_factor", 1e-4))
        iters = int(param.get("total_iters", 100))
        return lambda epoch: lr * (
            start + (end - start) * min(epoch, iters) / iters
        )
    if name == "reducelronplateau":
        # metric-driven factor handled at the trainer level
        return lambda epoch: lr
    raise ValueError(f"unknown scheduler {name}")


def build_optimizer(
    name: str = "adam",
    lr: float = 0.01,
    optim_param: Optional[Dict[str, Any]] = None,
    schedule=None,
    spec: Optional[ModelSpec] = None,
    params=None,
):
    """Build an optax GradientTransformation with unit internal lr, chained
    with an ``inject_hyperparams(scale)`` whose ``step_size`` the Trainer
    sets host-side each epoch (schedule x plateau factor) — the per-epoch
    semantics of the reference's torch schedulers. If ``spec`` and ``params``
    are given, frozen leaves (per spec train flags) get zero updates.
    """
    p = dict(optim_param or {})
    del schedule  # epoch schedules are applied via the injected scale
    name = name.lower()
    if name == "sgd":
        opt = optax.sgd(1.0, momentum=p.get("momentum", 0.0))
    elif name == "adagrad":
        opt = optax.adagrad(1.0)
    elif name == "adam":
        opt = optax.adam(1.0, **{k: v for k, v in p.items() if k in ("b1", "b2", "eps")})
    elif name == "adamw":
        opt = optax.adamw(1.0, weight_decay=p.get("weight_decay", 1e-2))
    elif name == "radam":
        opt = optax.radam(1.0)
    else:
        raise ValueError(f"unknown optimizer {name}")
    opt = optax.chain(
        opt, optax.inject_hyperparams(optax.scale)(step_size=float(lr))
    )

    if spec is not None and params is not None:
        # NB: optax.masked would pass raw gradients through for frozen leaves
        # (gradient ascent!) — multi_transform + set_to_zero actually freezes.
        mask = trainable_mask(spec, params)
        import jax

        labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
        opt = optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()}, labels
        )
    return opt


def trainable_mask(spec: ModelSpec, params) -> Any:
    """True = trainable. Mirrors the reference's requires_grad choices:
    bessel coeffs trainable (``BesselBasis`` default), denominators per
    ``train_denominator``, shift/scale per ``train_shift_scale``."""
    import jax

    def rule(path, leaf):
        keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        if "rescale_atomic_energy" in keys:
            return spec.train_shift_scale
        if any(isinstance(k, str) and k.endswith("_convolution") for k in keys) and (
            "denominator" in keys
        ):
            return spec.train_denominator
        return True

    return jax.tree_util.tree_map_with_path(rule, params)
