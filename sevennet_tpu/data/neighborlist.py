"""Host-side neighbor list (numpy/scipy), used for dataset building and the
calculator, equivalent to the reference's matscipy/ASE path
(``sevenn/train/dataload.py:32-88``).

Returns a *full* directed edge list without self edges: for every pair
within ``cutoff`` both directions appear. Semantics match matscipy
``neighbour_list('ijDS')``: for an edge ``(dst=i, src=j, shift=S)`` the
displacement is ``D = pos[j] + S @ cell - pos[i]``.

The jit-able on-device cell list for MD lives in
:mod:`sevennet_tpu.md.neighbor` — this module is the simple, always-correct
reference implementation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy.spatial import cKDTree

__all__ = ["neighbor_list_numpy"]


def neighbor_list_numpy(
    positions: np.ndarray,
    cutoff: float,
    cell: Optional[np.ndarray] = None,
    pbc=(False, False, False),
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Compute a full neighbor list.

    Returns ``(edge_dst, edge_src, shifts)`` — receiver ``i``, sender ``j``,
    integer cell shifts ``S`` with ``r_ij = pos[j] + S @ cell - pos[i]``.
    """
    positions = np.asarray(positions, dtype=np.float64)
    n = len(positions)
    if isinstance(pbc, (bool, np.bool_)):
        pbc = (bool(pbc),) * 3
    pbc = np.asarray(pbc, dtype=bool)
    if cell is None or not pbc.any():
        return _nopbc(positions, cutoff)

    cell = np.asarray(cell, dtype=np.float64).reshape(3, 3)
    if abs(np.linalg.det(cell)) < 1e-12:
        raise ValueError("periodic system with singular cell")

    # wrap positions along periodic axes; remember integer wraps
    inv = np.linalg.inv(cell)
    frac = positions @ inv
    wrap = np.where(pbc, np.floor(frac), 0.0)
    pos_w = (frac - wrap) @ cell

    # images needed per periodic axis: cutoff / perpendicular height
    recip = inv.T  # rows: reciprocal vectors (no 2pi)
    heights = 1.0 / np.linalg.norm(recip, axis=1)
    n_img = np.where(pbc, np.ceil(cutoff / heights).astype(int), 0)

    tree = cKDTree(pos_w)
    dsts, srcs, shifts = [], [], []
    for sa in range(-n_img[0], n_img[0] + 1):
        for sb in range(-n_img[1], n_img[1] + 1):
            for sc in range(-n_img[2], n_img[2] + 1):
                S = np.array([sa, sb, sc], dtype=np.float64)
                shifted = pos_w + S @ cell  # sender images
                pairs = tree.query_ball_point(shifted, r=cutoff)
                for j, i_list in enumerate(pairs):
                    for i in i_list:
                        if sa == 0 and sb == 0 and sc == 0 and i == j:
                            continue
                        dsts.append(i)
                        srcs.append(j)
                        shifts.append(S)
    if not dsts:
        return (
            np.zeros(0, np.int64),
            np.zeros(0, np.int64),
            np.zeros((0, 3), np.float64),
        )
    dst = np.asarray(dsts, dtype=np.int64)
    src = np.asarray(srcs, dtype=np.int64)
    S = np.asarray(shifts, dtype=np.float64)
    # correct shifts back to the original (unwrapped) positions:
    # pos_w = pos - wrap@cell  =>  D = pos[j] + (S - wrap_j + wrap_i)@cell - pos[i]
    S = S - wrap[src] + wrap[dst]
    return dst, src, S


def _nopbc(positions: np.ndarray, cutoff: float):
    tree = cKDTree(positions)
    pairs = tree.query_pairs(cutoff, output_type="ndarray")  # (P, 2), i<j
    if len(pairs) == 0:
        return (
            np.zeros(0, np.int64),
            np.zeros(0, np.int64),
            np.zeros((0, 3), np.float64),
        )
    i, j = pairs[:, 0], pairs[:, 1]
    dst = np.concatenate([i, j])
    src = np.concatenate([j, i])
    shifts = np.zeros((len(dst), 3), dtype=np.float64)
    return dst, src, shifts
