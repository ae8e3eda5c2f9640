"""Modality surgery on trained checkpoints: append or select modal channels
(the reference's ``sevenn/scripts/convert_model_modality.py`` and
``checkpoint.append_modal``, ``sevenn/checkpoint.py:458-584``).

Modal weights live as extra rows in the affected linears' instruction
matrices (the modality 0e block) and extra rows in modal-wise rescale
arrays; appending a modality copies an existing modality's rows as the
initialization for the new one.
"""

from __future__ import annotations

import copy
from typing import Dict

import numpy as np

from ..model.build import ModelSpec, build_model_spec

__all__ = ["append_modality", "select_modality"]


def _modal_block_indices(spec_linear, num_modalities: int):
    """Indices of instructions reading the modal 0e block (the LAST input
    block by construction; it may feed several scalar output blocks)."""
    cands = [
        idx
        for idx, (i_in, _, _) in enumerate(spec_linear.instructions)
        if spec_linear.irreps_in[i_in].ir.l == 0
        and spec_linear.irreps_in[i_in].mul == num_modalities
        and i_in == len(spec_linear.irreps_in) - 1
    ]
    assert cands, "no modal instruction found"
    return cands


def append_modality(
    model_config: Dict, params, new_modal: str, copy_from: int = 0
):
    """Returns (new_config, new_params) with one more modality appended."""
    import jax.numpy as jnp

    cfg = copy.deepcopy(model_config)
    assert cfg.get("use_modality"), "not a multi-fidelity model"
    old_m = int(cfg["num_modalities"])
    cfg["num_modalities"] = old_m + 1
    mm = dict(cfg.get("modal_map") or {})
    assert new_modal not in mm
    mm[new_modal] = old_m
    cfg["modal_map"] = mm

    old_spec = build_model_spec(model_config)
    # extend modal-wise shift/scale config rows for the new modality
    for key, flag in (("shift", old_spec.use_modal_wise_shift),
                      ("scale", old_spec.use_modal_wise_scale)):
        v = cfg.get(key)
        if flag and isinstance(v, (list, tuple)) and v and isinstance(
            v[0], (list, tuple)
        ):
            v = [list(r) for r in v]
            v.append(list(v[copy_from]))
            cfg[key] = v
    new_spec = build_model_spec(cfg)

    new_params = copy.deepcopy(
        {k: v for k, v in params.items()}
    )
    for name in old_spec.modal_linears:
        old_lin = _find_linear(old_spec, name)
        new_lin = _find_linear(new_spec, name)
        ws = list(new_params[name]["w"])
        modal_ins = set(_modal_block_indices(old_lin, old_m))
        for idx, ((_, _, a_old), (_, _, a_new)) in enumerate(
            zip(old_lin.instructions, new_lin.instructions)
        ):
            w = np.asarray(params[name]["w"][idx])
            if idx in modal_ins:
                w = np.concatenate([w, w[copy_from : copy_from + 1]], axis=0)
            # keep alpha * w invariant when the fan-in changed (the reference
            # scales scalar-path weights by sqrt(new_fan/old_fan),
            # convert_model_modality.py:59)
            ws[idx] = jnp.asarray(w * (a_old / a_new))
        new_params[name]["w"] = ws

    rs = new_params["rescale_atomic_energy"]
    for key, flag in (("shift", old_spec.use_modal_wise_shift),
                      ("scale", old_spec.use_modal_wise_scale)):
        arr = np.asarray(rs[key])
        if flag and arr.ndim == 2 and arr.shape[0] == old_m:
            rs[key] = jnp.asarray(
                np.concatenate([arr, arr[copy_from : copy_from + 1]], axis=0)
            )
    return cfg, new_params


def select_modality(model_config: Dict, params, modal: str):
    """Collapse a multi-fidelity model to a single-fidelity one by baking in
    the chosen modality (used at deploy time; reference
    ``prepare_modal_deploy``). The modal one-hot contribution folds into the
    scalar biases-free linear as a constant addition — we instead keep the
    modality machinery and pin the modal index in the returned config."""
    cfg = copy.deepcopy(model_config)
    mm = dict(cfg.get("modal_map") or {})
    assert modal in mm, f"unknown modality {modal}; have {sorted(mm)}"
    cfg["_pinned_modal"] = mm[modal]
    return cfg, params


def _find_linear(spec: ModelSpec, name: str):
    if name == "onehot_to_feature_x":
        return spec.embed_linear
    if name == "reduce_input_to_hidden":
        return spec.readout1
    for layer in spec.layers:
        if name == f"{layer.t}_self_interaction_1":
            return layer.si1
        if name == f"{layer.t}_self_interaction_2":
            return layer.si2
    raise KeyError(name)
