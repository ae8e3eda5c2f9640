"""On-device (jit-able) cell-list neighbor rebuild.

The TPU-native replacement for the reference's host-side matscipy/ASE
neighbor build (``sevenn/train/dataload.py:32-88``) and LAMMPS' neighbor
machinery in the deployed pair styles (``pair_e3gnn.cpp:136-170``): all
static shapes, fixed capacities, overflow flags instead of dynamic growth
(the torch reference adapts its edge bound at runtime,
``pair_e3gnn.cpp:283-288`` — under XLA that becomes capacity + overflow
detection + host-driven recompile).

Algorithm (all under jit):
1. wrap fractional coordinates, bin atoms into an ``nx*ny*nz`` grid
   (grid cell edge >= cutoff along each lattice height);
2. sort atoms by cell id; per-cell contiguous ranges;
3. for each of the 27 neighbor-cell offsets, gather up to ``cell_capacity``
   candidates and insert the ones within cutoff into per-atom neighbor
   slots (``neighbor_capacity``) with scatter writes;
4. report overflow (cell or neighbor capacity exceeded) so the host can
   rebuild the spec with larger capacities and recompile.

Requires every lattice height >= cutoff (one periodic image per direction).
Smaller boxes should use the host neighbor list.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CellListSpec", "build_cell_list_spec", "rebuild_neighbors"]


@dataclass(frozen=True)
class CellListSpec:
    n_cells: Tuple[int, int, int]
    cell_capacity: int
    neighbor_capacity: int
    cutoff: float  # interaction cutoff + skin
    edge_cap: int = 0  # compacted edge capacity (0 = no compaction, N*K)

    @property
    def total_cells(self) -> int:
        nx, ny, nz = self.n_cells
        return nx * ny * nz

    def edge_capacity(self, n_atoms_cap: int) -> int:
        if self.edge_cap > 0:
            return self.edge_cap
        return n_atoms_cap * self.neighbor_capacity


def build_cell_list_spec(
    cell: np.ndarray,
    n_atoms: int,
    cutoff: float,
    skin: float = 0.5,
    capacity_factor: float = 1.6,
    neighbor_capacity: int | None = None,
) -> CellListSpec:
    """Host-side: choose static grid dims and capacities."""
    cell = np.asarray(cell, dtype=np.float64).reshape(3, 3)
    rc = cutoff + skin
    recip = np.linalg.inv(cell).T
    heights = 1.0 / np.linalg.norm(recip, axis=1)
    n_cells = np.maximum(np.floor(heights / rc).astype(int), 1)
    if (heights < rc).any():
        raise ValueError(
            f"lattice heights {heights} smaller than cutoff+skin {rc}; "
            "use the host neighbor list for small boxes"
        )
    vol = abs(np.linalg.det(cell))
    density = n_atoms / vol
    cell_vol = vol / n_cells.prod()
    cap = int(np.ceil(density * cell_vol * capacity_factor)) + 2
    expected_nbrs = 4.0 / 3.0 * np.pi * rc**3 * density
    if neighbor_capacity is None:
        # sphere volume * density * safety (per-atom worst case)
        neighbor_capacity = int(np.ceil(expected_nbrs * capacity_factor)) + 4
    # compacted edge capacity: average neighbor count * modest safety
    edge_cap = int(np.ceil(n_atoms * expected_nbrs * 1.25)) + 64
    edge_cap = min(edge_cap, n_atoms * int(neighbor_capacity))
    edge_cap = -(-edge_cap // 256) * 256
    return CellListSpec(
        n_cells=tuple(int(x) for x in n_cells),
        cell_capacity=cap,
        neighbor_capacity=int(neighbor_capacity),
        cutoff=rc,
        edge_cap=edge_cap,
    )


def rebuild_neighbors(spec: CellListSpec, positions, cell, atom_mask):
    """positions (N,3), cell (3,3), atom_mask (N,) ->
    (edge_src, edge_dst, edge_shift, edge_mask, overflow).

    Edge convention matches the data model: for edge e,
    ``vec_e = positions[src] + shift @ cell - positions[dst]`` and
    both directions are emitted (the stencil covers all 27 offsets).
    Output arrays have length ``N * neighbor_capacity``; ``dst`` is the slot
    owner.
    """
    n = positions.shape[0]
    nx, ny, nz = spec.n_cells
    ncells = spec.total_cells
    C = spec.cell_capacity
    K = spec.neighbor_capacity
    dtype = positions.dtype

    inv = jnp.linalg.inv(cell)
    frac = positions @ inv
    frac = frac - jnp.floor(frac)  # wrap to [0,1)
    grid = jnp.asarray([nx, ny, nz])
    coords = jnp.clip((frac * grid).astype(jnp.int32), 0, grid - 1)  # (N,3)
    cid = (coords[:, 0] * ny + coords[:, 1]) * nz + coords[:, 2]
    # park padded atoms in a virtual overflow cell
    cid = jnp.where(atom_mask, cid, ncells)

    counts = jax.ops.segment_sum(
        jnp.ones(n, jnp.int32), cid, num_segments=ncells + 1
    )
    order = jnp.argsort(cid, stable=True)  # atoms sorted by cell
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)])[:-1]
    cell_overflow = jnp.any(counts[:ncells] > C)

    # per-cell member table (ncells, C): sorted_ids gathered by start+k
    k_iota = jnp.arange(C)
    member_idx = starts[:ncells, None] + k_iota[None, :]  # (ncells, C)
    member_valid = k_iota[None, :] < jnp.minimum(counts[:ncells, None], C)
    member_idx = jnp.clip(member_idx, 0, n - 1)
    members = jnp.where(member_valid, order[member_idx], n - 1)  # (ncells, C)

    pos_w = frac @ cell  # wrapped cartesian positions

    # candidate sweep over the 27-cell stencil: per-offset distance tests
    # (bounded (N, C) temporaries), then ONE row-cumsum + ONE scatter into
    # the slot grid — the per-offset scatter rounds serialized 27 small
    # scatters and dominated the rebuild (~237 ms at 3k in round 2)
    cands, oks, shifts8 = [], [], []
    for off in itertools.product((-1, 0, 1), repeat=3):
        off_arr = jnp.asarray(off, jnp.int32)
        nb = coords + off_arr  # (N, 3) neighbor cell coords
        S = jnp.floor_divide(nb, grid)  # periodic image shift
        nbw = nb - S * grid
        nb_cid = (nbw[:, 0] * ny + nbw[:, 1]) * nz + nbw[:, 2]
        cand = members[nb_cid]  # (N, C) candidate atom ids (src)
        cand_valid = member_valid[nb_cid]
        Sf = S.astype(dtype)  # (N, 3)
        # vec = pos[src] + S @ cell - pos[dst]
        vec = pos_w[cand] + (Sf @ cell)[:, None, :] - pos_w[:, None, :]
        dist2 = jnp.sum(vec * vec, axis=-1)
        within = dist2 < spec.cutoff**2
        is_self = (cand == jnp.arange(n)[:, None]) & (S == 0).all(-1)[:, None]
        ok = (
            within
            & cand_valid
            & ~is_self
            & atom_mask[:, None]
            & atom_mask[cand]
        )
        cands.append(cand)
        oks.append(ok)
        shifts8.append(
            jnp.broadcast_to(
                S.astype(jnp.int8)[:, None, :], (n, C, 3)
            )
        )
    cand_all = jnp.concatenate(cands, axis=1)            # (N, 27C)
    ok_all = jnp.concatenate(oks, axis=1)
    shift_all = jnp.concatenate(shifts8, axis=1)         # (N, 27C, 3) int8
    slot = jnp.cumsum(ok_all.astype(jnp.int32), axis=1) - 1
    slot = jnp.where(ok_all, slot, K)                    # K == drop
    rows = jnp.broadcast_to(
        jnp.arange(n)[:, None], cand_all.shape
    )
    src_slots = jnp.zeros((n, K), jnp.int32).at[rows, slot].set(
        cand_all, mode="drop"
    )
    shift_slots = (
        jnp.zeros((n, K, 3), jnp.int8)
        .at[rows, slot].set(shift_all, mode="drop")
        .astype(dtype)
    )
    valid_slots = jnp.zeros((n, K), bool).at[rows, slot].set(
        ok_all, mode="drop"
    )
    slot_count = ok_all.sum(axis=1)

    neighbor_overflow = jnp.any(slot_count > K)
    edge_src = src_slots.reshape(-1)
    edge_dst = jnp.repeat(jnp.arange(n, dtype=jnp.int32), K)
    edge_shift = shift_slots.reshape(-1, 3)
    edge_mask = valid_slots.reshape(-1)
    edge_src = jnp.where(edge_mask, edge_src, 0)
    overflow = cell_overflow | neighbor_overflow

    # compact the N*K slot grid down to edge_cap entries: stable sort by
    # validity keeps the dst-sorted order of the real edges; padding tail
    # points at the last atom so edge_dst stays sorted
    e_cap = spec.edge_capacity(n)
    if e_cap < n * K:
        order = jnp.argsort(~edge_mask, stable=True)[:e_cap]
        edge_src = edge_src[order]
        edge_dst = edge_dst[order]
        edge_shift = edge_shift[order]
        new_mask = edge_mask[order]
        overflow = overflow | (jnp.sum(edge_mask) > e_cap)
        edge_mask = new_mask
        edge_dst = jnp.where(edge_mask, edge_dst, n - 1)
        edge_src = jnp.where(edge_mask, edge_src, 0)
    return edge_src, edge_dst, edge_shift, edge_mask, overflow, pos_w
