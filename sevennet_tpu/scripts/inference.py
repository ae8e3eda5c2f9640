"""Batch inference: checkpoint + structures -> per-graph / per-atom CSVs
and error summary (the reference ``sevenn/scripts/inference.py:141-255``)."""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from ..data.dataset import GraphDataset
from ..train.error_recorder import ErrorRecorder, RecorderSpec

__all__ = ["inference"]


def inference(
    checkpoint: str,
    targets: List[str],
    output_dir: str = "sevennet_tpu_infer_result",
    batch_size: int = 4,
    save_graph: bool = False,
):
    import jax

    from ..io.registry import load_model
    from ..model.model import model_compute

    spec, params = load_model(checkpoint)  # name / .pth / native
    ds = GraphDataset.from_extxyz(targets, spec.cutoff)
    ds.build(spec.z_to_type)

    f = jax.jit(lambda p, g: model_compute(spec, p, g))
    # the reference's inference metric table (scripts/inference.py:141-255
    # via util.get_error_recorder): RMSE + MAE per channel, plus the
    # per-component force RMSE
    acc = ErrorRecorder(RecorderSpec.from_config([
        ("Energy", "RMSE"), ("Energy", "MAE"),
        ("Force", "RMSE"), ("Force", "ComponentRMSE"), ("Force", "MAE"),
        ("Stress", "RMSE"), ("Stress", "MAE"),
    ]))

    per_graph_rows = []
    per_atom_rows = []
    gi = 0
    for gb in ds.batches(batch_size):
        out = f(params, gb)
        acc.update(out, gb)
        e = np.asarray(out["energy"])
        s = np.asarray(out["stress"])
        fpred = np.asarray(out["forces"])
        batch_of = np.asarray(gb.batch)
        mask = np.asarray(gb.atom_mask)
        gmask = np.asarray(gb.graph_mask)
        e_ref = np.asarray(gb.energy)
        f_ref = np.asarray(gb.forces)
        natoms = np.asarray(gb.num_atoms)
        for b in range(gb.n_graphs_cap):
            if not gmask[b]:
                continue
            per_graph_rows.append(
                dict(
                    idx=gi,
                    natoms=int(natoms[b]),
                    energy=float(e[b]),
                    ref_energy=float(e_ref[b]),
                    stress_xx=float(s[b, 0]),
                )
            )
            gi += 1
        for a in range(gb.n_atoms_cap):
            if not mask[a]:
                continue
            per_atom_rows.append(
                dict(
                    graph=int(batch_of[a]),
                    fx=float(fpred[a, 0]), fy=float(fpred[a, 1]), fz=float(fpred[a, 2]),
                    ref_fx=float(f_ref[a, 0]), ref_fy=float(f_ref[a, 1]), ref_fz=float(f_ref[a, 2]),
                )
            )

    os.makedirs(output_dir, exist_ok=True)
    _write_csv(os.path.join(output_dir, "per_graph.csv"), per_graph_rows)
    _write_csv(os.path.join(output_dir, "per_atom.csv"), per_atom_rows)
    errors = acc.get_metric_dict(with_unit=True)
    with open(os.path.join(output_dir, "errors.txt"), "w") as f_:
        for k, v in errors.items():
            f_.write(f"{k}: {v}\n")
    return errors


def _write_csv(path: str, rows):
    if not rows:
        return
    cols = list(rows[0].keys())
    with open(path, "w") as f:
        f.write(",".join(cols) + "\n")
        for r in rows:
            f.write(",".join(str(r[c]) for c in cols) + "\n")
