"""Multi-fidelity (multi-modal) dataset: a concat of per-modality datasets
with combined statistics.

Mirrors the reference ``SevenNetMultiModalDataset``
(``sevenn/train/modal_dataset.py:29-130``): each structure is tagged with
its modality index; shift/scale statistics are either combined across
modalities (``combined_mean/std/rms`` pooling) or modal-wise lists for
``use_modal_wise_shift/scale``. Accepts the reference's multi-modal data
config (``presets/multi_modal.yaml``):

    load_trainset_path:
      - data_modality: pbe
        file_list: [{file: a.extxyz}, ...]
        data_weight: {energy: 1.0, force: 0.1, stress: 1.0}
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional

import numpy as np

from .dataset import GraphDataset, atoms_to_graph
from .graph import GraphBatch, batch_graphs

__all__ = ["MultiModalDataset", "combined_mean", "combined_std", "combined_rms"]


def combined_mean(means, sizes) -> float:
    means, sizes = np.asarray(means, float), np.asarray(sizes, float)
    return float((means * sizes).sum() / sizes.sum())


def _combined_variance(means, stds, sizes) -> float:
    means, stds, sizes = (np.asarray(a, float) for a in (means, stds, sizes))
    total = sizes.sum()
    cm = (means * sizes).sum() / total
    return float(((sizes * stds**2).sum() + (sizes * (means - cm) ** 2).sum()) / total)


def combined_std(means, stds, sizes) -> float:
    return float(np.sqrt(_combined_variance(means, stds, sizes)))


def combined_rms(means, stds, sizes) -> float:
    cm = combined_mean(means, sizes)
    return float(np.sqrt(cm**2 + _combined_variance(means, stds, sizes)))


@dataclass
class MultiModalDataset:
    """Ordered dict of per-modality datasets sharing one type map."""

    datasets: Dict[str, GraphDataset]
    modal_map: Dict[str, int]
    data_weights: Dict[str, Dict[str, float]] = field(default_factory=dict)

    @staticmethod
    def from_config(entries: List[Dict], cutoff: float, modal_map=None):
        """``entries`` in the reference's multi-modal yaml format."""
        datasets: Dict[str, GraphDataset] = {}
        weights: Dict[str, Dict[str, float]] = {}
        names = []
        for ent in entries:
            name = str(ent["data_modality"])
            files = [f["file"] if isinstance(f, dict) else f
                     for f in ent.get("file_list", [])]
            ds = GraphDataset.from_extxyz(files, cutoff)
            datasets[name] = ds
            names.append(name)
            if ent.get("data_weight"):
                weights[name] = {k: float(v) for k, v in ent["data_weight"].items()}
        if modal_map is None:
            modal_map = {n: i for i, n in enumerate(names)}
        for name, ds in datasets.items():
            ds.modal = int(modal_map[name])
            # modality-level data weights multiply into per-structure weights
            # (reference: data_weight per database, multi_modal.yaml:85-88)
            w = weights.get(name)
            if w:
                for at in ds.atoms_list:
                    at.info = dict(at.info or {})
                    dw = at.info.get("data_weight", {})
                    if isinstance(dw, (int, float)):
                        dw = {"energy": dw, "force": dw, "stress": dw}
                    at.info["data_weight"] = {
                        k: float(dw.get(k, 1.0)) * float(w.get(k, 1.0))
                        for k in ("energy", "force", "stress")
                    }
        return MultiModalDataset(datasets, dict(modal_map), weights)

    # ------------------------------------------------------------------
    def __len__(self):
        return sum(len(d) for d in self.datasets.values())

    @property
    def species(self) -> List[str]:
        out = set()
        for d in self.datasets.values():
            out |= set(d.species)
        return sorted(out)

    def build(self, z_to_type=None, processes: int = 1):
        for d in self.datasets.values():
            d.build(z_to_type, processes=processes)
        return self

    def split(self, ratio: float, seed: int = 777):
        tr, va = {}, {}
        for name, d in self.datasets.items():
            a, b = d.split(ratio, seed=seed)
            a.modal = b.modal = d.modal
            tr[name], va[name] = a, b
        return (
            MultiModalDataset(tr, self.modal_map, self.data_weights),
            MultiModalDataset(va, self.modal_map, self.data_weights),
        )

    # -- statistics (combined across modalities) ------------------------
    def _pooled(self, key_mean, key_std) -> tuple:
        means, stds, sizes = [], [], []
        for d in self.datasets.values():
            s = d.statistics
            means.append(s[key_mean])
            stds.append(s.get(key_std, 0.0))
            sizes.append(max(len(d), 1))
        return means, stds, sizes

    @property
    def per_atom_energy_mean(self) -> List[float]:
        """Modal-wise list ordered by modal index (for ModalWiseRescale);
        use :meth:`per_atom_energy_mean_combined` for a single value."""
        by_idx = sorted(self.datasets.values(), key=lambda d: d.modal)
        return [d.per_atom_energy_mean for d in by_idx]

    @property
    def per_atom_energy_mean_combined(self) -> float:
        m, s, n = self._pooled("per_atom_energy_mean", "per_atom_energy_std")
        return combined_mean(m, n)

    @property
    def force_rms(self) -> float:
        # pool the per-dataset force distributions: rms over all components
        means, stds, sizes = [], [], []
        for d in self.datasets.values():
            s = d.statistics
            rms = s["force_rms"]
            # per-dataset force mean ~ 0; rms pooling via sizes = #components
            means.append(0.0)
            stds.append(rms)
            sizes.append(max(len(d), 1))
        return combined_rms(means, stds, sizes)

    @property
    def avg_num_neigh(self) -> float:
        m, s, n = self._pooled("avg_num_neigh", "_none")
        return combined_mean(m, n)

    @property
    def sqrt_avg_num_neigh(self) -> float:
        return float(np.sqrt(self.avg_num_neigh))

    @property
    def elemwise_reference_energies(self) -> List[float]:
        # pooled ridge solution over all structures (modality-agnostic)
        allats = [at for d in self.datasets.values() for at in d.atoms_list]
        pooled = GraphDataset(
            allats, next(iter(self.datasets.values())).cutoff
        )
        return pooled.statistics["elemwise_reference_energies"]

    # -- batching --------------------------------------------------------
    def batches(
        self,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        pad_multiple: int = 64,
        drop_last: bool = False,
        dense_k: int = 0,
        with_mirror: bool = False,
    ) -> Iterator[GraphBatch]:
        """Globally shuffled padded batches; every graph carries its
        modality index (GraphBatch.modal)."""
        graphs = []
        for d in self.datasets.values():
            assert d.graphs, "call build() first"
            graphs.extend(d.graphs)
        order = np.arange(len(graphs))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        if drop_last:
            order = order[: len(order) - len(order) % batch_size]
        caps = None
        for i in range(0, len(order), batch_size):
            chunk = [graphs[j] for j in order[i : i + batch_size]]
            n_cap = -(-max(int(g.positions.shape[0]) for g in chunk) * len(chunk)
                      // pad_multiple) * pad_multiple
            e_cap = -(-sum(int(g.edge_src.shape[0]) for g in chunk)
                      // pad_multiple) * pad_multiple
            caps = (
                (n_cap, e_cap)
                if caps is None
                else (max(caps[0], n_cap), max(caps[1], e_cap))
            )
            yield batch_graphs(
                chunk,
                n_atoms_cap=caps[0],
                n_edges_cap=caps[1],
                n_graphs_cap=batch_size,
                dense_k=dense_k,
                with_mirror=with_mirror,
            )
