"""Training orchestration: config -> datasets -> model -> epoch loop.

The flow of the reference ``sevenn/scripts/train.py:train_v2`` +
``processing_epoch.py``: build datasets (with statistics feeding
shift/scale/conv_denominator), build the model, run epochs with periodic
and best-metric checkpoints and an ``lc.csv`` learning curve.
Continue/restart follows ``processing_continue.py:16-92``: model weights,
optimizer and epoch come from the checkpoint; statistics (shift/scale/
denominator) are NOT recomputed.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from ..config import read_config_yaml
from ..data.dataset import GraphDataset
from ..logger import LearningCurveCSV, Logger
from ..model.build import build_model_spec, symbols_to_type_map
from ..model.model import model_init
from ..train.loss import LossConfig
from ..train.trainer import Trainer, TrainerConfig

__all__ = ["train_from_yaml", "train_run"]


def _resolve_statistics(model_cfg: Dict, data_cfg: Dict, trainset, log: Logger):
    """Replace string placeholders (shift/scale/conv_denominator) with
    dataset statistics, mirroring ``graph_dataset.from_config`` (:682-692).
    For multi-modal datasets, modal-wise shift/scale resolve to per-modality
    lists; otherwise combined statistics are used
    (``modal_dataset.py:29-130`` pooling)."""
    for key, holder in (("shift", model_cfg), ("scale", model_cfg)):
        v = data_cfg.get(key, holder.get(key))
        if isinstance(v, str):
            modal_wise = bool(model_cfg.get(f"use_modal_wise_{key}", False))
            if not modal_wise and hasattr(trainset, v + "_combined"):
                v = getattr(trainset, v + "_combined")
            else:
                v = getattr(trainset, v)
            log.format_k_v(f"{key} (from statistics)", v if np.isscalar(v) else "per-element list")
        holder[key] = v
    cd = model_cfg.get("conv_denominator")
    if isinstance(cd, str):
        model_cfg["conv_denominator"] = getattr(trainset, cd)
        log.format_k_v("conv_denominator (from statistics)", model_cfg["conv_denominator"])


def train_from_yaml(yaml_path: str, working_dir: str = ".", max_epochs: Optional[int] = None):
    model_cfg, train_cfg, data_cfg = read_config_yaml(yaml_path)
    return train_run(model_cfg, train_cfg, data_cfg, working_dir, max_epochs)


def train_run(
    model_cfg: Dict,
    train_cfg: Dict,
    data_cfg: Dict,
    working_dir: str = ".",
    max_epochs: Optional[int] = None,
):
    os.makedirs(working_dir, exist_ok=True)
    log = Logger(os.path.join(working_dir, "log.sevennet_tpu"))
    log.writeline("SevenNet-TPU training")
    log.timer_start("total")

    # datasets — multi-modal when entries carry 'data_modality'
    # (the reference's multi_modal.yaml format)
    cutoff = float(model_cfg["cutoff"])
    train_paths = data_cfg["load_trainset_path"]
    assert train_paths, "data.load_trainset_path must be given"
    multimodal = (
        isinstance(train_paths, list)
        and train_paths
        and isinstance(train_paths[0], dict)
        and "data_modality" in train_paths[0]
    )
    if multimodal:
        from ..data.modal_dataset import MultiModalDataset

        trainset = MultiModalDataset.from_config(
            train_paths, cutoff, model_cfg.get("modal_map") or None
        )
        model_cfg["use_modality"] = True
        model_cfg.setdefault("num_modalities", len(trainset.modal_map))
        model_cfg.setdefault("modal_map", dict(trainset.modal_map))
        log.format_k_v("modalities", sorted(trainset.modal_map))
    else:
        trainset = GraphDataset.from_extxyz(train_paths, cutoff)
    validset = None
    if data_cfg.get("load_validset_path"):
        if multimodal:
            from ..data.modal_dataset import MultiModalDataset

            validset = MultiModalDataset.from_config(
                data_cfg["load_validset_path"], cutoff, model_cfg["modal_map"]
            )
        else:
            validset = GraphDataset.from_extxyz(
                data_cfg["load_validset_path"], cutoff
            )
    elif float(
        data_cfg.get("ratio") or data_cfg.get("data_divide_ratio") or 0.0
    ) > 0:
        # reference key: data_divide_ratio (``_const.py``); 'ratio' kept as
        # a shorthand alias
        trainset, validset = trainset.split(float(
            data_cfg.get("ratio") or data_cfg["data_divide_ratio"]
        ))
    log.format_k_v("# train structures", len(trainset))
    log.format_k_v("# valid structures", len(validset) if validset else 0)

    # species
    if model_cfg.get("chemical_species", "auto") == "auto":
        species = sorted(
            set(trainset.species) | set(validset.species if validset else [])
        )
        model_cfg["chemical_species"] = species
        log.format_k_v("chemical_species (auto)", species)

    # continue: the spec (incl. frozen shift/scale/denominator statistics,
    # processing_continue.py:43-55) comes from the checkpoint — do NOT
    # resolve statistics from the new dataset or rebuild from model_cfg
    cont = train_cfg.get("continue", {}) or {}
    _cont_loaded = None
    if cont.get("checkpoint"):
        from ..io.native_checkpoint import load_checkpoint

        _cont_loaded = load_checkpoint(cont["checkpoint"])
        spec = _cont_loaded[0]
    else:
        _resolve_statistics(model_cfg, data_cfg, trainset, log)
        # model
        spec = build_model_spec(model_cfg)
    z2t = spec.z_to_type
    n_cores = int(data_cfg.get("preprocess_num_cores", 1))
    trainset.build(z2t, processes=n_cores)
    if validset:
        validset.build(z2t, processes=n_cores)

    # dense (N, K) edge layout for the fused/dense convolution (the fast
    # conv path on TPU); capacity = max neighbor count + margin
    dense_k = 0
    if bool(model_cfg.get("_conv_dense", True)):
        import dataclasses

        def _maxnb(ds):
            if hasattr(ds, "datasets"):
                return max(d.max_neighbors() for d in ds.datasets.values())
            return ds.max_neighbors()

        k_max = _maxnb(trainset)
        if validset:
            k_max = max(k_max, _maxnb(validset))
        dense_k = -(-int(np.ceil(k_max * 1.1) + 1) // 8) * 8
        spec = dataclasses.replace(spec, edge_dense_k=dense_k)
        log.format_k_v("dense neighbor capacity", dense_k)

    # continue?
    import jax

    start_epoch = 0
    cont_opt_state = None
    cont_meta = {}
    if cont.get("checkpoint"):
        spec_cp, params, meta = _cont_loaded
        spec = spec_cp
        if dense_k:
            import dataclasses

            spec = dataclasses.replace(spec, edge_dense_k=dense_k)
        cont_meta = meta
        if not cont.get("reset_epoch"):
            start_epoch = int(meta.get("epoch", 0))
        if not cont.get("reset_optimizer"):
            import os as _os

            op = _os.path.join(str(cont["checkpoint"]), "opt_state.msgpack")
            if _os.path.exists(op):
                with open(op, "rb") as f:
                    cont_opt_state = f.read()
        log.format_k_v("continue from", cont["checkpoint"])
    else:
        params = model_init(jax.random.PRNGKey(int(train_cfg.get("random_seed", 1))), spec)

    # fused Pallas conv kernels in the TRAINING path (the analogue of
    # enabling cuEq/FlashTP for training, reference accelerator.md): the
    # conv's custom_vjp backward rule is itself differentiable
    # (ops/fused_conv._make_bwd_op), so the force/stress-loss grad-of-grad
    # composes. Batches then carry the mirror-edge permutation and pad the
    # atom capacity to the kernel block size.
    pad_mult = 64
    if dense_k:
        import dataclasses

        env = os.environ.get("SEVENNET_TPU_FUSED")
        fused_flag = model_cfg.get("_conv_fused", "auto")
        if fused_flag == "auto":
            fused_flag = (
                bool(int(env)) if env is not None
                else jax.default_backend() == "tpu"
            )
        if fused_flag:
            from ..ops.fused_conv import fused_conv_block_atoms

            A = fused_conv_block_atoms(dense_k)
            pad_mult = -(-64 // A) * A
            spec = dataclasses.replace(
                spec, conv_fused=True, conv_param_grads=True
            )
            log.format_k_v("fused conv kernels (train)", f"on, block={A}")

    # stress loss is computed in kbar inside compute_losses (as the
    # reference does at loss.py:185), so the weight passes through unchanged
    loss_cfg = LossConfig(
        criterion=str(train_cfg.get("loss", "mse")).lower(),
        huber_delta=float(train_cfg.get("loss_param", {}).get("delta", 0.01)),
        force_weight=float(train_cfg.get("force_loss_weight", 0.1)),
        stress_weight=float(train_cfg.get("stress_loss_weight", 1e-6)),
        train_stress=bool(train_cfg.get("is_train_stress", True)),
        use_weight=bool(train_cfg.get("use_weight", False)),
    )
    from ..train.error_recorder import DEFAULT_ERROR_RECORD

    tcfg = TrainerConfig(
        loss=loss_cfg,
        optimizer=str(train_cfg.get("optimizer", "adam")),
        lr=float(train_cfg.get("optim_param", {}).get("lr", 0.01)),
        optim_param=dict(train_cfg.get("optim_param", {})),
        scheduler=str(train_cfg.get("scheduler", "constant")),
        scheduler_param=dict(train_cfg.get("scheduler_param", {})),
        error_record=tuple(
            tuple(e) for e in train_cfg.get("error_record", DEFAULT_ERROR_RECORD)
        ),
    )
    trainer = Trainer(spec, params, tcfg)
    if cont_opt_state is not None:
        trainer.load_opt_state(cont_opt_state)
        log.writeline("continue: optimizer state restored")
    if cont.get("checkpoint"):
        aux = dict(cont_meta.get("extra", {}).get("trainer", {}))
        if cont.get("reset_scheduler"):
            aux.pop("plateau_best", None)
            aux.pop("plateau_bad", None)
            aux.pop("plateau_scale", None)
            aux["sched_epoch0"] = start_epoch
        trainer.load_aux_state(aux)

    # best-checkpoint criterion (reference 'best_metric', TotalLoss default)
    _METRIC_KEY = {
        "totalloss": "loss_total",
        "energy": "Energy_RMSE",
        "force": "Force_RMSE",
        "stress": "Stress_RMSE",
    }
    best_metric_key = _METRIC_KEY.get(
        str(train_cfg.get("best_metric", "TotalLoss")).lower(), "loss_total"
    )

    lc = LearningCurveCSV(os.path.join(working_dir, "lc.csv"))
    n_epochs = int(max_epochs or train_cfg.get("epoch", 10))
    batch_size = int(data_cfg.get("batch_size", 6))
    per_epoch = int(train_cfg.get("per_epoch", 10))
    best = float(cont_meta.get("extra", {}).get("best", np.inf)) if not cont.get(
        "reset_epoch"
    ) else np.inf

    def _save(tag, epoch):
        from ..io.native_checkpoint import save_checkpoint

        save_checkpoint(
            os.path.join(working_dir, tag),
            model_cfg, trainer.state.params, trainer.state.opt_state, epoch,
            extra={"trainer": trainer.aux_state(), "best": best},
        )

    for epoch in range(start_epoch + 1, start_epoch + n_epochs + 1):
        log.timer_start("epoch")
        trainer.set_epoch(epoch - 1)  # lr for this epoch
        tr = trainer.run_epoch(
            trainset.batches(
                batch_size,
                shuffle=bool(train_cfg.get("train_shuffle", True)),
                seed=epoch,
                dense_k=dense_k,
                pad_multiple=pad_mult,
                with_mirror=spec.conv_fused,
            ),
            train=True,
        )
        rows = {"train": tr}
        if validset:
            va = trainer.run_epoch(
                validset.batches(
                    batch_size, dense_k=dense_k, pad_multiple=pad_mult,
                    with_mirror=spec.conv_fused,
                ),
                train=False,
            )
            rows["valid"] = va
        lc.append(epoch, rows)
        key_metrics = rows.get("valid", rows["train"])
        log.writeline(
            f"epoch {epoch}: lr={trainer.current_lr(epoch - 1):.3e} "
            + " ".join(
                f"{k}={v:.4g}" for k, v in key_metrics.items()
                if "loss" in k.lower() or "rmse" in k.lower()
            )
        )
        log.timer_end("epoch", f"epoch {epoch} time")

        crit = key_metrics.get(best_metric_key, np.inf)
        trainer.plateau_step(crit)

        if crit < best:
            best = crit
            _save("checkpoint_best", epoch)
        if epoch % per_epoch == 0:
            _save(f"checkpoint_{epoch}", epoch)

    _save("checkpoint_last", start_epoch + n_epochs)
    log.timer_end("total", "total training time")
    log.close()
    return trainer
