"""Batched multi-system inference (the reference's TorchSim interface,
``sevenn/torchsim.py:56-292``): evaluate many structures in one padded
GraphBatch / one compiled call — the natural mode for high-throughput
screening on TPU.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np

from .atoms import as_atoms
from .data.dataset import atoms_to_graph
from .data.graph import batch_graphs
from .model.build import ModelSpec
from .model.model import model_compute

__all__ = ["BatchedCalculator"]


def _rup(n, m):
    return int(math.ceil(max(n, 1) / m)) * m


class BatchedCalculator:
    """Evaluate a list of structures per call; shapes are bucketed so
    repeated calls with similar-size batches reuse compiled programs."""

    def __init__(self, model, params=None, matmul_precision: str = "highest"):
        if isinstance(model, ModelSpec):
            assert params is not None
            spec = model
        else:
            from .io.native_checkpoint import load_checkpoint

            spec, params, _ = load_checkpoint(str(model))
        import dataclasses

        # memory-safe evaluation policy for arbitrary batch sizes: the
        # flat conv path without remat/chunking holds (E, dim_mid)
        # per-edge tensors per layer through the force backward — ~10 GB
        # for a 3k-atom batch of SevenNet-0 (measured OOM on a 16 GB
        # chip). Rematerialize layers and stream edges in chunks; specs
        # that already set a chunk keep it.
        spec = dataclasses.replace(
            spec,
            remat_layers=True,
            edge_chunk=spec.edge_chunk or 32768,
        )
        self.spec = spec
        self.params = params
        prec = matmul_precision

        def fn(params, graph):
            with jax.default_matmul_precision(prec):
                return model_compute(spec, params, graph)

        self._fn = jax.jit(fn)

    def calculate(self, structures: Sequence) -> List[Dict[str, Any]]:
        ats = [as_atoms(s) for s in structures]
        graphs = [
            atoms_to_graph(at, self.spec.cutoff, self.spec.z_to_type) for at in ats
        ]
        n_tot = sum(len(at) for at in ats)
        e_tot = sum(int(g.edge_src.shape[0]) for g in graphs)
        gb = batch_graphs(
            graphs,
            n_atoms_cap=_rup(n_tot + 1, 64),
            n_edges_cap=_rup(e_tot + 1, 256),
            n_graphs_cap=len(graphs) + 1,
        )
        out = self._fn(self.params, gb)
        energies = np.asarray(out["energy"])
        forces = np.asarray(out["forces"])
        atomic_e = np.asarray(out["atomic_energy"])
        stress = np.asarray(out["stress"])
        results = []
        off = 0
        for i, at in enumerate(ats):
            n = len(at)
            r = {
                "energy": float(energies[i]),
                "forces": forces[off : off + n],
                "energies": atomic_e[off : off + n],
            }
            if at.cell is not None and at.pbc.any():
                r["stress"] = -stress[i][[0, 1, 2, 4, 5, 3]]
            results.append(r)
            off += n
        return results
