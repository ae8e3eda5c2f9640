"""Padded, fixed-shape atom-graph batches (the TPU-native data model).

The reference framework passes a ``Dict[str, Tensor]`` with dynamic shapes
through every module (``sevenn/atom_graph_data.py``). On TPU everything under
``jit`` must have static shapes, so the de-facto interface here is
:class:`GraphBatch`: a frozen pytree of arrays padded to fixed capacities
``(n_atoms_cap, n_edges_cap, n_graphs_cap)`` with boolean masks.

Conventions (matching the reference semantics):

- ``edge_src`` is the *sender* (reference ``EDGE_IDX[1]``), ``edge_dst`` the
  *receiver* (reference ``EDGE_IDX[0]``); messages flow src -> dst
  (``sevenn/nn/convolution.py:128-133``).
- ``edge_vec = pos[src] - pos[dst] + shift @ cell[graph(dst)]`` (reference
  ``EdgePreprocess``, ``sevenn/nn/edge_embedding.py:63-77``).
- Padding atoms/edges point at index 0; masks zero their contributions.
- Labels use NaN for "unlabeled" like the reference loss masking
  (``sevenn/train/loss.py:49-60``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = ["GraphBatch", "graph_from_arrays", "batch_graphs", "pad_graph"]


@struct.dataclass
class GraphBatch:
    # atoms
    positions: jnp.ndarray  # (N, 3) float
    species: jnp.ndarray  # (N,) int32 type indices (NOT atomic numbers)
    atom_mask: jnp.ndarray  # (N,) bool
    batch: jnp.ndarray  # (N,) int32 graph index
    # edges
    edge_src: jnp.ndarray  # (E,) int32 sender
    edge_dst: jnp.ndarray  # (E,) int32 receiver
    edge_shift: jnp.ndarray  # (E, 3) float cell-shift counts
    edge_mask: jnp.ndarray  # (E,) bool
    # graphs
    cell: jnp.ndarray  # (G, 3, 3) float (rows are lattice vectors)
    volume: jnp.ndarray  # (G,) float (>= small eps for non-PBC)
    num_atoms: jnp.ndarray  # (G,) int32
    graph_mask: jnp.ndarray  # (G,) bool
    # labels (NaN = unlabeled)
    energy: Optional[jnp.ndarray] = None  # (G,)
    forces: Optional[jnp.ndarray] = None  # (N, 3)
    stress: Optional[jnp.ndarray] = None  # (G, 6) eV/A^3, voigt (xx,yy,zz,xy,yz,zx)
    # optional multi-fidelity modality index per graph
    modal: Optional[jnp.ndarray] = None  # (G,) int32
    # optional per-structure loss weights (reference loss.py:115-120)
    data_weight: Optional[jnp.ndarray] = None  # (G, 3): energy/force/stress
    # optional mirror-edge index (flat, dense layout) for the fused conv
    # backward (ops/fused_conv.mirror_map)
    edge_mir: Optional[jnp.ndarray] = None  # (E,) int32

    @property
    def n_atoms_cap(self) -> int:
        return self.positions.shape[0]

    @property
    def n_edges_cap(self) -> int:
        return self.edge_src.shape[0]

    @property
    def n_graphs_cap(self) -> int:
        return self.cell.shape[0]

    def edge_vectors(self, positions: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        pos = self.positions if positions is None else positions
        cell_per_edge = self.cell[self.batch[self.edge_dst]]
        return (
            pos[self.edge_src]
            - pos[self.edge_dst]
            + jnp.einsum("ei,eij->ej", self.edge_shift, cell_per_edge)
        )


def graph_from_arrays(
    positions: np.ndarray,
    species: np.ndarray,
    edge_src: np.ndarray,
    edge_dst: np.ndarray,
    edge_shift: np.ndarray,
    cell: Optional[np.ndarray] = None,
    energy: float = np.nan,
    forces: Optional[np.ndarray] = None,
    stress: Optional[np.ndarray] = None,
    modal: int = 0,
    data_weight=(1.0, 1.0, 1.0),
    dtype=np.float32,
) -> GraphBatch:
    """Single unpadded graph (host-side numpy). Species are type indices."""
    n = len(positions)
    e = len(edge_src)
    # graph contract: edges sorted by receiver (edge_dst) — enables
    # indices_are_sorted fast paths in the scatter-sum on TPU
    if e > 1:
        order = np.argsort(np.asarray(edge_dst), kind="stable")
        edge_src = np.asarray(edge_src)[order]
        edge_dst = np.asarray(edge_dst)[order]
        edge_shift = np.asarray(edge_shift)[order]
    if cell is None:
        cell = np.zeros((3, 3))
        volume = 0.0
    else:
        volume = float(abs(np.linalg.det(cell)))
    if forces is None:
        forces = np.full((n, 3), np.nan)
    if stress is None:
        stress = np.full((6,), np.nan)
    # HOST numpy arrays, deliberately: a single un-batched graph is a
    # host-side artifact (dataset building, batching input). Eager
    # jnp.asarray here meant one device put PER FIELD PER GRAPH — ~30 ms
    # each through the axon TPU tunnel, turning a 32-system batch build
    # into ~17 s of round trips (round 5). The jit boundary (or
    # batch_graphs) transfers the batched arrays once.
    return GraphBatch(
        positions=np.asarray(positions, dtype),
        species=np.asarray(species, np.int32),
        atom_mask=np.ones((n,), bool),
        batch=np.zeros((n,), np.int32),
        edge_src=np.asarray(edge_src, np.int32),
        edge_dst=np.asarray(edge_dst, np.int32),
        edge_shift=np.asarray(edge_shift, dtype),
        edge_mask=np.ones((e,), bool),
        cell=np.asarray(cell, dtype)[None],
        volume=np.asarray([max(volume, 1e-3)], dtype),
        num_atoms=np.asarray([n], np.int32),
        graph_mask=np.ones((1,), bool),
        energy=np.asarray([energy], dtype),
        forces=np.asarray(forces, dtype),
        stress=np.asarray(stress, dtype)[None],
        modal=np.asarray([modal], np.int32),
        data_weight=np.asarray([list(data_weight)], dtype),
    )


def _pad_to(arr: np.ndarray, n: int, fill=0):
    pad = n - arr.shape[0]
    assert pad >= 0, f"capacity {n} < size {arr.shape[0]}"
    if pad == 0:
        return np.asarray(arr)
    pad_block = np.full((pad,) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([np.asarray(arr), pad_block], axis=0)


def densify_edges(
    edge_src: np.ndarray,
    edge_dst: np.ndarray,
    edge_shift: np.ndarray,
    edge_mask: np.ndarray,
    n_cap: int,
    k_cap: int,
    dtype=np.float32,
):
    """Redistribute a flat dst-sorted edge list into the dense (N, K) slot
    layout the fused convolution consumes (flat row = i*K + k, receiver i).

    Padded slots get ``src = dst = owner`` (self-gather, masked); raises if
    any atom has more than ``k_cap`` neighbors.
    """
    real = np.flatnonzero(edge_mask)
    dst = edge_dst[real]
    counts = np.bincount(dst, minlength=n_cap)
    if counts.max(initial=0) > k_cap:
        raise ValueError(
            f"dense neighbor capacity {k_cap} < max neighbor count "
            f"{int(counts.max())}"
        )
    # slot index within each receiver group (edges are dst-sorted)
    starts = np.zeros(n_cap + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    slot = np.arange(len(dst)) - starts[dst]
    flat = dst.astype(np.int64) * k_cap + slot
    owner = (np.arange(n_cap * k_cap) // k_cap).astype(np.int32)
    src_d = owner.copy()
    dst_d = owner.copy()
    shift_d = np.zeros((n_cap * k_cap, 3), dtype)
    mask_d = np.zeros(n_cap * k_cap, bool)
    src_d[flat] = edge_src[real]
    shift_d[flat] = edge_shift[real]
    mask_d[flat] = True
    return src_d, dst_d, shift_d, mask_d


def batch_graphs(
    graphs: Sequence[GraphBatch],
    n_atoms_cap: Optional[int] = None,
    n_edges_cap: Optional[int] = None,
    n_graphs_cap: Optional[int] = None,
    dtype=np.float32,
    dense_k: int = 0,
    with_mirror: bool = False,
) -> GraphBatch:
    """Concatenate single graphs into one padded batch (host-side).

    ``dense_k > 0`` emits edges in the dense (N, K) slot layout (row-major
    by receiver) that the fused/dense convolution consumes
    (``ModelSpec.edge_dense_k``); the flat segment-sum path also accepts it.
    ``with_mirror`` additionally computes the mirror-edge permutation the
    fused Pallas conv's backward needs (``ops/fused_conv.mirror_map``) —
    required when training/inference runs with ``spec.conv_fused``.
    """
    gs = [jnp_to_np(g) for g in graphs]
    n_tot = sum(g["positions"].shape[0] for g in gs)
    e_tot = sum(g["edge_src"].shape[0] for g in gs)
    g_tot = len(gs)
    n_cap = n_atoms_cap or n_tot
    e_cap = n_edges_cap or e_tot
    g_cap = n_graphs_cap or g_tot
    assert n_cap >= n_tot and e_cap >= e_tot and g_cap >= g_tot

    pos, spec, bat, f = [], [], [], []
    esrc, edst, eshift = [], [], []
    cells, vols, natoms, energies, stresses, modals = [], [], [], [], [], []
    weights = []
    a_off = 0
    for gi, g in enumerate(gs):
        n = g["positions"].shape[0]
        pos.append(g["positions"])
        spec.append(g["species"])
        bat.append(np.full((n,), gi, np.int32))
        f.append(g["forces"])
        esrc.append(g["edge_src"] + a_off)
        edst.append(g["edge_dst"] + a_off)
        eshift.append(g["edge_shift"])
        cells.append(g["cell"][0])
        vols.append(g["volume"][0])
        natoms.append(n)
        energies.append(g["energy"][0])
        stresses.append(g["stress"][0])
        modals.append(g["modal"][0] if g.get("modal") is not None else 0)
        weights.append(
            g["data_weight"][0] if g.get("data_weight") is not None else [1.0] * 3
        )
        a_off += n

    cat = lambda xs: np.concatenate(xs, axis=0) if xs else np.zeros((0,))
    positions = _pad_to(cat(pos).astype(dtype), n_cap)
    species = _pad_to(cat(spec).astype(np.int32), n_cap)
    atom_mask = _pad_to(np.ones((n_tot,), bool), n_cap, fill=False)
    batch = _pad_to(cat(bat).astype(np.int32), n_cap, fill=g_cap - 1)
    forces = _pad_to(cat(f).astype(dtype), n_cap)
    edge_mir = None
    if dense_k > 0:
        edge_src, edge_dst, edge_shift, edge_mask = densify_edges(
            cat(esrc).astype(np.int32),
            cat(edst).astype(np.int32),
            cat(eshift).astype(dtype),
            np.ones((e_tot,), bool),
            n_cap,
            dense_k,
            dtype,
        )
        if with_mirror:
            from ..ops.fused_conv import mirror_map_numpy

            edge_mir = mirror_map_numpy(
                edge_src.reshape(n_cap, dense_k),
                edge_shift.reshape(n_cap, dense_k, 3),
                edge_mask.reshape(n_cap, dense_k),
            ).reshape(-1)
    else:
        edge_src = _pad_to(cat(esrc).astype(np.int32), e_cap)
        # pad receivers with the LAST atom slot to keep edge_dst sorted
        edge_dst = _pad_to(cat(edst).astype(np.int32), e_cap, fill=n_cap - 1)
        edge_shift = _pad_to(cat(eshift).astype(dtype), e_cap)
        edge_mask = _pad_to(np.ones((e_tot,), bool), e_cap, fill=False)
    cell = _pad_to(np.stack(cells).astype(dtype), g_cap)
    volume = _pad_to(np.asarray(vols, dtype), g_cap, fill=1.0)
    num_atoms = _pad_to(np.asarray(natoms, np.int32), g_cap, fill=1)
    graph_mask = _pad_to(np.ones((g_tot,), bool), g_cap, fill=False)
    energy = _pad_to(np.asarray(energies, dtype), g_cap, fill=np.nan)
    stress = _pad_to(np.stack(stresses).astype(dtype), g_cap, fill=np.nan)
    modal = _pad_to(np.asarray(modals, np.int32), g_cap)
    data_weight = _pad_to(np.asarray(weights, dtype), g_cap, fill=1.0)

    return GraphBatch(
        positions=jnp.asarray(positions),
        species=jnp.asarray(species),
        atom_mask=jnp.asarray(atom_mask),
        batch=jnp.asarray(batch),
        edge_src=jnp.asarray(edge_src),
        edge_dst=jnp.asarray(edge_dst),
        edge_shift=jnp.asarray(edge_shift),
        edge_mask=jnp.asarray(edge_mask),
        cell=jnp.asarray(cell),
        volume=jnp.asarray(volume),
        num_atoms=jnp.asarray(num_atoms),
        graph_mask=jnp.asarray(graph_mask),
        energy=jnp.asarray(energy),
        forces=jnp.asarray(forces),
        stress=jnp.asarray(stress),
        modal=jnp.asarray(modal),
        data_weight=jnp.asarray(data_weight),
        edge_mir=None if edge_mir is None else jnp.asarray(edge_mir),
    )


def jnp_to_np(g: GraphBatch) -> dict:
    out = {}
    for k in (
        "positions species atom_mask batch edge_src edge_dst edge_shift "
        "edge_mask cell volume num_atoms graph_mask energy forces stress "
        "modal data_weight"
    ).split():
        v = getattr(g, k)
        out[k] = None if v is None else np.asarray(v)
    return out


def pad_graph(g: GraphBatch, n_atoms_cap: int, n_edges_cap: int) -> GraphBatch:
    return batch_graphs([g], n_atoms_cap=n_atoms_cap, n_edges_cap=n_edges_cap)
