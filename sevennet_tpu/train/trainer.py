"""Training engine: jitted train/eval steps, data-parallel over a device
mesh.

The reference wraps the model in torch DDP with NCCL all-reduce
(``sevenn/train/trainer.py:54-69``). TPU-native equivalent: microbatches are
stacked with a leading device axis and the step runs under ``shard_map``
over a 1-D ``dp`` mesh axis — gradients are ``psum``-averaged over ICI, the
optimizer update happens replicated (identical on every device), which is
exactly DDP's semantics without parameter sharding.

Second-order autodiff (force loss -> grad of grad of energy) is native to
``jax.grad`` composition — the reference needs ``create_graph=True``
(``force_output.py:180``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.graph import GraphBatch
from ..model.build import ModelSpec
from ..model.model import model_compute
from .error_recorder import (
    DEFAULT_ERROR_RECORD,
    RecorderSpec,
    recorder_empty,
    recorder_finalize,
    recorder_update,
)
from .loss import LossConfig, compute_losses
from .optim import build_optimizer, build_schedule

__all__ = ["TrainState", "TrainerConfig", "Trainer"]


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # () int32
    epoch: int = struct.field(pytree_node=False, default=0)


@dataclass
class TrainerConfig:
    loss: LossConfig = field(default_factory=LossConfig)
    optimizer: str = "adam"
    lr: float = 0.01
    optim_param: Dict[str, Any] = field(default_factory=dict)
    scheduler: str = "constant"
    scheduler_param: Dict[str, Any] = field(default_factory=dict)
    matmul_precision: str = "highest"
    # metric table, reference 'error_record' (_const.py:276-281)
    error_record: Any = DEFAULT_ERROR_RECORD


class Trainer:
    def __init__(
        self,
        spec: ModelSpec,
        params,
        config: TrainerConfig = None,
        mesh: Optional[Mesh] = None,
    ):
        self.spec = spec
        self.config = config or TrainerConfig()
        self.mesh = mesh  # 1-D mesh with axis 'dp', or None for single device
        # LR is an injected hyperparameter in the optimizer STATE, set
        # host-side per epoch = schedule(epoch) * plateau factor — matching
        # the reference's per-epoch scheduler.step() (trainer.py:177-184)
        self._plateau = self.config.scheduler.lower() == "reducelronplateau"
        self._plateau_best = float("inf")
        self._plateau_bad = 0
        p = self.config.scheduler_param
        self._plateau_factor = float(p.get("factor", 0.5))
        self._plateau_patience = int(p.get("patience", 10))
        self._plateau_scale = 1.0
        self.schedule = build_schedule(
            self.config.scheduler, self.config.lr, self.config.scheduler_param
        )
        self.sched_epoch0 = 0  # schedule origin (continue.reset_scheduler)
        self.optimizer = build_optimizer(
            self.config.optimizer,
            self.config.lr,
            self.config.optim_param,
            spec=spec,
            params=params,
        )
        self.recorder_spec = RecorderSpec.from_config(
            self.config.error_record, self.config.loss
        )
        self.state = TrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            step=jnp.asarray(0, jnp.int32),
        )
        self._train_step = None
        self._eval_step = None

    # ------------------------------------------------------------------
    def _set_lr(self, lr: float):
        from optax import tree_utils as otu

        self.state = self.state.replace(
            opt_state=otu.tree_set(self.state.opt_state, step_size=float(lr))
        )

    def current_lr(self, epoch: int) -> float:
        return self.schedule(max(epoch - self.sched_epoch0, 0)) * self._plateau_scale

    def set_epoch(self, epoch: int):
        """Apply the epoch schedule (call before each epoch's batches)."""
        self._set_lr(self.current_lr(epoch))

    def load_opt_state(self, raw_opt_state):
        """Restore optimizer state from a checkpoint (msgpack tree or
        matching pytree) — continue semantics without reset_optimizer."""
        from flax import serialization

        template = self.optimizer.init(self.state.params)
        if isinstance(raw_opt_state, bytes):
            restored = serialization.from_bytes(template, raw_opt_state)
        else:
            flat_t, treedef = jax.tree_util.tree_flatten(template)
            flat_r = jax.tree_util.tree_leaves(raw_opt_state)
            assert len(flat_t) == len(flat_r), (
                f"optimizer state mismatch: {len(flat_t)} vs {len(flat_r)} leaves"
            )
            restored = jax.tree_util.tree_unflatten(
                treedef,
                [jnp.asarray(r, t.dtype).reshape(t.shape) if hasattr(t, "shape")
                 else r for t, r in zip(flat_t, flat_r)],
            )
        self.state = self.state.replace(opt_state=restored)

    def aux_state(self) -> Dict[str, Any]:
        """Host-side scheduler/plateau state for checkpointing."""
        return {
            "plateau_best": self._plateau_best,
            "plateau_bad": self._plateau_bad,
            "plateau_scale": self._plateau_scale,
            "sched_epoch0": self.sched_epoch0,
        }

    def load_aux_state(self, aux: Dict[str, Any]):
        self._plateau_best = float(aux.get("plateau_best", float("inf")))
        self._plateau_bad = int(aux.get("plateau_bad", 0))
        self._plateau_scale = float(aux.get("plateau_scale", 1.0))
        self.sched_epoch0 = int(aux.get("sched_epoch0", 0))

    # ------------------------------------------------------------------
    def _loss_and_metrics(self, params, graph: GraphBatch):
        with jax.default_matmul_precision(self.config.matmul_precision):
            out = model_compute(self.spec, params, graph)
        total, losses = compute_losses(out, graph, self.config.loss)
        acc = recorder_update(
            self.recorder_spec, recorder_empty(self.recorder_spec), out, graph
        )
        return total, (losses, acc)

    def _make_train_step(self) -> Callable:
        optimizer = self.optimizer

        def single_device_step(state: TrainState, graph: GraphBatch):
            (total, (losses, acc)), grads = jax.value_and_grad(
                self._loss_and_metrics, has_aux=True
            )(state.params, graph)
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=params, opt_state=opt_state, step=state.step + 1
            )
            return new_state, (losses, acc)

        if self.mesh is None:
            return jax.jit(single_device_step)

        mesh = self.mesh
        from jax import shard_map

        def sharded_step(state: TrainState, graphs: GraphBatch):
            # graphs have a leading device axis (D, ...)
            def per_device(state, graph_stack):
                graph = jax.tree.map(lambda x: x[0], graph_stack)
                (total, (losses, acc)), grads = jax.value_and_grad(
                    self._loss_and_metrics, has_aux=True
                )(state.params, graph)
                grads = jax.lax.pmean(grads, "dp")
                losses = jax.lax.pmean(losses, "dp")
                acc = jax.lax.psum(acc, "dp")
                updates, opt_state = self.optimizer.update(
                    grads, state.opt_state, state.params
                )
                params = optax.apply_updates(state.params, updates)
                return (
                    state.replace(
                        params=params, opt_state=opt_state, step=state.step + 1
                    ),
                    (losses, acc),
                )

            return shard_map(
                per_device,
                mesh=mesh,
                in_specs=(P(), P("dp")),
                out_specs=(P(), (P(), P())),
                check_vma=False,
            )(state, graphs)

        return jax.jit(sharded_step)

    def _make_eval_step(self) -> Callable:
        def eval_step(params, graph: GraphBatch):
            with jax.default_matmul_precision(self.config.matmul_precision):
                out = model_compute(self.spec, params, graph)
            _, losses = compute_losses(out, graph, self.config.loss)
            acc = recorder_update(
                self.recorder_spec, recorder_empty(self.recorder_spec),
                out, graph,
            )
            return losses, acc

        return jax.jit(eval_step)

    # ------------------------------------------------------------------
    def train_step(self, graph_or_stack) -> Dict[str, float]:
        if self._train_step is None:
            self._train_step = self._make_train_step()
        self.state, (losses, acc) = self._train_step(self.state, graph_or_stack)
        return losses, acc

    def eval_step(self, graph) -> Tuple[Dict, Dict]:
        if self._eval_step is None:
            self._eval_step = self._make_eval_step()
        return self._eval_step(self.state.params, graph)

    def plateau_step(self, metric: float):
        """Reduce the plateau lr factor when ``metric`` stops improving."""
        if not self._plateau:
            return
        if metric < self._plateau_best - 1e-12:
            self._plateau_best = metric
            self._plateau_bad = 0
            return
        self._plateau_bad += 1
        if self._plateau_bad > self._plateau_patience:
            self._plateau_bad = 0
            self._plateau_scale *= self._plateau_factor

    def run_epoch(self, loader, train: bool = True) -> Dict[str, float]:
        """loader yields GraphBatch (or device-stacked GraphBatch when a mesh
        is configured). Returns averaged losses + finalized metrics."""
        acc_total = recorder_empty(self.recorder_spec)
        loss_sums: Dict[str, float] = {}
        n = 0
        for graph in loader:
            if train:
                losses, acc = self.train_step(graph)
            else:
                losses, acc = self.eval_step(graph)
            acc_total = jax.tree.map(lambda a, b: a + b, acc_total, acc)
            for k, v in losses.items():
                loss_sums[k] = loss_sums.get(k, 0.0) + float(v)
            n += 1
        result = {f"loss_{k}": v / max(n, 1) for k, v in loss_sums.items()}
        result.update(recorder_finalize(self.recorder_spec, acc_total))
        return result
