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
    param = dict(param or {})
    name = (name or "constant").lower()
    if name in ("constant", "none"):
        return lr
    if name == "steplr":
        step_size = int(param.get("step_size", 1))
        gamma = float(param.get("gamma", 0.1))
        return lambda step: lr * gamma ** (step // step_size)
    if name == "multisteplr":
        milestones = sorted(int(m) for m in param.get("milestones", []))
        gamma = float(param.get("gamma", 0.1))

        def sched(step):
            import jax.numpy as jnp

            k = sum((step >= m).astype(int) if hasattr(step, "astype") else (step >= m)
                    for m in milestones)
            return lr * gamma**k

        return sched
    if name == "exponentiallr":
        gamma = float(param.get("gamma", 0.99))
        return lambda step: lr * gamma**step
    if name == "cosineannealinglr":
        t_max = int(param.get("T_max", 100))
        eta_min = float(param.get("eta_min", 0.0))
        return optax.cosine_decay_schedule(lr, t_max, alpha=eta_min / max(lr, 1e-30))
    if name == "linearlr":
        start = float(param.get("start_factor", 1.0))
        end = float(param.get("end_factor", 1e-4))
        iters = int(param.get("total_iters", 100))
        return optax.linear_schedule(lr * start, lr * end, iters)
    if name == "reducelronplateau":
        # handled at the trainer level (host-side metric-driven factor);
        # return base lr here
        return lr
    raise ValueError(f"unknown scheduler {name}")


def build_optimizer(
    name: str = "adam",
    lr: float = 0.01,
    optim_param: Optional[Dict[str, Any]] = None,
    schedule=None,
    spec: Optional[ModelSpec] = None,
    params=None,
):
    """Build an optax GradientTransformation; if ``spec`` and ``params`` are
    given, frozen leaves (per spec train flags) get zero updates."""
    p = dict(optim_param or {})
    lr_or_sched = schedule if schedule is not None else lr
    name = name.lower()
    if name == "sgd":
        opt = optax.sgd(lr_or_sched, momentum=p.get("momentum", 0.0))
    elif name == "adagrad":
        opt = optax.adagrad(lr_or_sched)
    elif name == "adam":
        opt = optax.adam(lr_or_sched, **{k: v for k, v in p.items() if k in ("b1", "b2", "eps")})
    elif name == "adamw":
        opt = optax.adamw(lr_or_sched, weight_decay=p.get("weight_decay", 1e-2))
    elif name == "radam":
        opt = optax.radam(lr_or_sched)
    else:
        raise ValueError(f"unknown optimizer {name}")

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
