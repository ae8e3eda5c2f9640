"""Graph dataset: structures -> padded graph batches + statistics.

TPU-native replacement of ``SevenNetGraphDataset``
(``sevenn/train/graph_dataset.py``): graphs are built host-side (numpy
neighbor lists), bucketed by (atom, edge) capacity so XLA compiles only a
handful of batch shapes, and the statistics the reference derives for model
initialization are reproduced:

- ``per_atom_energy_mean`` / ``per_atom_energy_std``  (shift/scale sources)
- ``elemwise_reference_energies``: ridge regression (alpha=0.1, no
  intercept) of total energy on composition (``graph_dataset.py:116-130``)
- ``force_rms``
- ``avg_num_neigh`` / ``sqrt_avg_num_neigh``  (conv denominator sources)
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..atoms import AtomsLite, as_atoms
from ..model.build import NUM_UNIV_ELEMENT
from .graph import GraphBatch, batch_graphs, graph_from_arrays
from .neighborlist import neighbor_list_numpy

__all__ = ["GraphDataset", "atoms_to_graph"]


def atoms_to_graph(at: AtomsLite, cutoff: float, z_to_type: np.ndarray, modal: int = 0) -> GraphBatch:
    """Build a single labeled graph (reference ``atoms_to_graph``,
    ``dataload.py:102-223``)."""
    species = z_to_type[at.numbers]
    if (species < 0).any():
        bad = sorted(set(int(z) for z in at.numbers[species < 0]))
        raise ValueError(f"unknown species {bad} for this model")
    dst, src, shifts = neighbor_list_numpy(at.positions, cutoff, at.cell, at.pbc)
    dw = at.info.get("data_weight", {}) if at.info else {}
    if isinstance(dw, (int, float)):
        dw = {"energy": dw, "force": dw, "stress": dw}
    return graph_from_arrays(
        at.positions,
        species,
        src,
        dst,
        shifts,
        at.cell,
        energy=at.energy if at.energy is not None else np.nan,
        forces=at.forces,
        stress=at.stress,
        modal=modal,
        data_weight=(
            float(dw.get("energy", 1.0)),
            float(dw.get("force", 1.0)),
            float(dw.get("stress", 1.0)),
        ),
    )


class _BuildOne:
    """Picklable worker for the multiprocess graph build."""

    def __init__(self, cutoff, z_to_type, modal):
        self.cutoff, self.z_to_type, self.modal = cutoff, z_to_type, modal

    def __call__(self, at):
        return atoms_to_graph(at, self.cutoff, self.z_to_type, self.modal)


@dataclass
class GraphDataset:
    atoms_list: List[AtomsLite]
    cutoff: float
    z_to_type: Optional[np.ndarray] = None  # if None: identity mapping later
    modal: int = 0
    graphs: List[GraphBatch] = field(default_factory=list)
    _stats: Optional[Dict] = None

    @staticmethod
    def from_files(path, cutoff: float, z_to_type=None, modal: int = 0) -> "GraphDataset":
        """Build from any supported structure file(s): extxyz natively,
        OUTCAR/POSCAR/structure_list natively, and every other format via
        ``ase.io.read`` when ASE is installed (the reference's universal
        ingestion, ``sevenn/train/dataload.py:351-519``)."""
        from .readers import read_structures

        paths = [path] if isinstance(path, str) else list(path)
        frames: List[AtomsLite] = []
        for p in paths:
            frames.extend(read_structures(p))
        return GraphDataset(frames, cutoff, z_to_type, modal)

    # kept name from earlier rounds; now dispatches on format
    from_extxyz = from_files

    # -- species ------------------------------------------------------------
    @property
    def species(self) -> List[str]:
        from ..model.build import CHEMICAL_SYMBOLS

        zs = sorted({int(z) for at in self.atoms_list for z in at.numbers})
        return [CHEMICAL_SYMBOLS[z] for z in zs]

    def build(self, z_to_type: Optional[np.ndarray] = None, processes: int = 1):
        """Build all graphs; ``processes > 1`` fans the (numpy-only) neighbor
        list + labeling work over a multiprocessing pool (the reference's
        ``graph_build`` mp.Pool, ``dataload.py:226-269``; config key
        ``preprocess_num_cores``)."""
        if z_to_type is not None:
            self.z_to_type = z_to_type
        assert self.z_to_type is not None
        if processes > 1 and len(self.atoms_list) > 1:
            import multiprocessing as mp

            with mp.get_context("fork").Pool(processes) as pool:
                self.graphs = pool.map(
                    _BuildOne(self.cutoff, self.z_to_type, self.modal),
                    self.atoms_list,
                    chunksize=max(1, len(self.atoms_list) // (processes * 8)),
                )
        else:
            self.graphs = [
                atoms_to_graph(at, self.cutoff, self.z_to_type, self.modal)
                for at in self.atoms_list
            ]
        return self

    def __len__(self):
        return len(self.atoms_list)

    # -- statistics ----------------------------------------------------------
    @property
    def statistics(self) -> Dict:
        if self._stats is None:
            self._stats = self._run_stat()
        return self._stats

    def _run_stat(self) -> Dict:
        energies, pae, comps, f_all, nn_all = [], [], [], [], []
        for at in self.atoms_list:
            n = len(at)
            if at.energy is not None and np.isfinite(at.energy):
                energies.append(at.energy)
                pae.append(at.energy / n)
                comp = np.bincount(at.numbers, minlength=NUM_UNIV_ELEMENT)
                comps.append(comp)
            if at.forces is not None:
                f_all.append(np.asarray(at.forces).reshape(-1))
            dst, _, _ = neighbor_list_numpy(at.positions, self.cutoff, at.cell, at.pbc)
            counts = np.bincount(dst, minlength=n)
            nn_all.append(counts)
        f_cat = np.concatenate(f_all) if f_all else np.zeros(1)
        nn_cat = np.concatenate(nn_all) if nn_all else np.zeros(1)
        pae = np.asarray(pae) if pae else np.zeros(1)
        stats = {
            "per_atom_energy_mean": float(pae.mean()),
            "per_atom_energy_std": float(pae.std()),  # ddof=0, reference correction=0
            "force_rms": float(np.sqrt((f_cat**2).mean())),
            "avg_num_neigh": float(nn_cat.mean()),
            "sqrt_avg_num_neigh": float(np.sqrt(nn_cat.mean())),
        }
        if comps:
            C = np.asarray(comps, dtype=np.float64)
            y = np.asarray(energies, dtype=np.float64)
            nonzero = C.any(axis=0)
            Cr = C[:, nonzero]
            # ridge, alpha=0.1, no intercept (reference graph_dataset.py:116-130)
            A = Cr.T @ Cr + 0.1 * np.eye(Cr.shape[1])
            coef = np.linalg.solve(A, Cr.T @ y)
            full = np.zeros(NUM_UNIV_ELEMENT)
            full[nonzero] = coef
            stats["elemwise_reference_energies"] = full.tolist()
        return stats

    # convenience accessors mirroring the reference property names
    @property
    def per_atom_energy_mean(self):
        return self.statistics["per_atom_energy_mean"]

    @property
    def per_atom_energy_std(self):
        return self.statistics["per_atom_energy_std"]

    @property
    def elemwise_reference_energies(self):
        return self.statistics["elemwise_reference_energies"]

    @property
    def force_rms(self):
        return self.statistics["force_rms"]

    @property
    def avg_num_neigh(self):
        return self.statistics["avg_num_neigh"]

    @property
    def sqrt_avg_num_neigh(self):
        return self.statistics["sqrt_avg_num_neigh"]

    # -- batching ------------------------------------------------------------
    def batches(
        self,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        pad_multiple: int = 64,
        drop_last: bool = False,
        lazy: bool = False,
        dense_k: int = 0,
        with_mirror: bool = False,
    ) -> Iterator[GraphBatch]:
        """Yield padded batches. Capacities are rounded up to multiples so
        similar batches share compiled programs. With ``lazy=True``, graphs
        are built on the fly per batch (the reference's memory-light
        ``SevenNetAtomsDataset``, ``train/atoms_dataset.py:27-112``) —
        ``build()`` is not required. ``dense_k > 0`` emits the dense (N, K)
        edge layout for the fused convolution."""
        if lazy:
            n_items = len(self.atoms_list)
        else:
            assert self.graphs, "call build() first (or use lazy=True)"
            n_items = len(self.graphs)
        idx = np.arange(n_items)
        if shuffle:
            np.random.default_rng(seed).shuffle(idx)
        rup = lambda n: int(math.ceil(max(n, 1) / pad_multiple)) * pad_multiple
        for i in range(0, len(idx), batch_size):
            sel = idx[i : i + batch_size]
            if drop_last and len(sel) < batch_size:
                continue
            if lazy:
                assert self.z_to_type is not None
                chunk = [
                    atoms_to_graph(
                        self.atoms_list[j], self.cutoff, self.z_to_type, self.modal
                    )
                    for j in sel
                ]
            else:
                chunk = [self.graphs[j] for j in sel]
            n_at = sum(int(g.positions.shape[0]) for g in chunk)
            n_ed = sum(int(g.edge_src.shape[0]) for g in chunk)
            yield batch_graphs(
                chunk,
                n_atoms_cap=rup(n_at + 1),
                n_edges_cap=rup(n_ed + 1),
                n_graphs_cap=batch_size + 1,
                dense_k=dense_k,
                with_mirror=with_mirror,
            )

    def max_neighbors(self) -> int:
        """Max per-atom neighbor count over built graphs (for dense_k)."""
        assert self.graphs, "call build() first"
        mx = 0
        for g in self.graphs:
            dst = np.asarray(g.edge_dst)
            if len(dst):
                mx = max(mx, int(np.bincount(dst).max()))
        return mx

    # -- disk cache (the reference caches processed graphs + stats yaml,
    #    graph_dataset.py:133-549) ---------------------------------------------
    def save_cache(self, path: str):
        """Serialize built graphs + statistics to ``{path}.npz``/``.json``."""
        import json

        assert self.graphs, "call build() first"
        arrays = {}
        for i, g in enumerate(self.graphs):
            for key in ("positions", "species", "edge_src", "edge_dst",
                        "edge_shift", "energy", "forces", "stress", "modal",
                        "data_weight", "cell"):
                arrays[f"g{i}_{key}"] = np.asarray(getattr(g, key))
        np.savez_compressed(path + ".npz", n=len(self.graphs), **arrays)
        with open(path + ".json", "w") as f:
            json.dump({"cutoff": self.cutoff, "statistics": self.statistics}, f)

    @staticmethod
    def load_cache(path: str) -> "GraphDataset":
        import json

        from .graph import GraphBatch
        import jax.numpy as jnp

        z = np.load(path + ".npz")
        with open(path + ".json") as f:
            meta = json.load(f)
        n = int(z["n"])
        graphs = []
        for i in range(n):
            g = z[f"g{i}_positions"]
            graphs.append(
                # reconstruct through graph_from_arrays for masks/caps
                graph_from_arrays(
                    z[f"g{i}_positions"],
                    z[f"g{i}_species"],
                    z[f"g{i}_edge_src"],
                    z[f"g{i}_edge_dst"],
                    z[f"g{i}_edge_shift"],
                    z[f"g{i}_cell"][0],
                    energy=float(z[f"g{i}_energy"][0]),
                    forces=z[f"g{i}_forces"],
                    stress=z[f"g{i}_stress"][0],
                    modal=int(z[f"g{i}_modal"][0]),
                    data_weight=tuple(z[f"g{i}_data_weight"][0].tolist()),
                )
            )
        ds = GraphDataset([], meta["cutoff"])
        ds.graphs = graphs
        ds._stats = meta["statistics"]
        return ds

    def split(self, ratio: float, seed: int = 0):
        idx = np.arange(len(self.atoms_list))
        np.random.default_rng(seed).shuffle(idx)
        n_valid = int(len(idx) * ratio)
        valid_idx = set(idx[:n_valid].tolist())
        tr = [a for i, a in enumerate(self.atoms_list) if i not in valid_idx]
        va = [a for i, a in enumerate(self.atoms_list) if i in valid_idx]
        return (
            GraphDataset(tr, self.cutoff, self.z_to_type, self.modal),
            GraphDataset(va, self.cutoff, self.z_to_type, self.modal),
        )
