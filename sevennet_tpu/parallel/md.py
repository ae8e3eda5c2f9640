"""Distributed (domain-decomposed) MD over a device mesh — the TPU-native
counterpart of the reference's parallel LAMMPS pair style
(``pair_e3gnn_parallel.cpp:194-506`` + the modified CommBrick halo exchange,
``comm_brick.cpp:1057-1123``), redesigned for SPMD:

- 1-D slab or 2-D/3-D **brick** decomposition of an ORTHOGONAL cell over a
  1-3-axis mesh; each device owns the atoms in its brick (fixed capacity +
  mask).
- Halos use the CommBrick **staged swap** scheme: exchange along axis 0,
  then along axis 1 shipping owned + axis-0 ghosts, then axis 2 — corner
  and edge ghosts ride along automatically with 2 ``ppermute`` calls per
  axis (``comm_brick.cpp:1057-1095`` does the same with 6 MPI swaps).
- Per step: ghost POSITIONS are refreshed with the staged exchanges, then
  the energy is evaluated with per-layer staged ghost FEATURE halos (the
  JCTC layer-synchronous scheme); forces come from ``jax.grad`` of the
  LOCAL energy sum — the ppermute transposes collectively route ghost
  cotangents back to owners, which IS the reference's ``reverse_comm``
  accumulation (``:404-441``) without hand-written code. (Do NOT psum the
  energy before grad: under ``check_vma=False`` the psum transpose would
  multiply forces by the device count.)
- Neighbor rebuild + ATOM MIGRATION run inside the jitted scan under a
  globally-agreed ``lax.cond`` (psum'd skin trigger): migrants pack into
  fixed-capacity buffers and ppermute to face neighbors axis by axis
  (diagonal moves complete across the sequential axis passes, like
  LAMMPS), then compact into the owner's free slots; the per-domain cell
  list runs on the extended (owned + ghost) set in a padded local frame so
  the existing jit cell list (md/neighbor.py) is reused unchanged.
- All capacity violations raise the overflow flag for the host to rebuild
  with bigger capacities (the static-shape analogue of LAMMPS' dynamic
  growth; cf. ``pair_e3gnn.cpp:283-288``).

Works on any mesh — 8 virtual CPU devices (1x8, 2x4 or 2x2x2) in tests,
ICI on a pod.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from ..md.neighbor import CellListSpec, build_cell_list_spec, rebuild_neighbors
from ..md.state import ATOMIC_MASSES, EV_A_AMU_TO_A_FS2, KB_EV
from ..model.build import ModelSpec
from ..model.model import _cutoff_envelope
from ..ops.gate import gate_apply
from ..ops.linear import linear_apply
from ..ops.mlp import scalar_mlp_apply
from ..ops.radial import bessel_basis
from ..ops.tensor_product import conv_tp_apply, fctp_apply
from ..so3.spherical import spherical_harmonics

__all__ = ["DistributedMDEngine", "DistMDState"]


@struct.dataclass
class DistMDState:
    """Per-device stacked MD state (leading axis = flattened device)."""

    positions: jnp.ndarray   # (D, NL, 3) global coords, wrapped
    velocities: jnp.ndarray  # (D, NL, 3)
    forces: jnp.ndarray      # (D, NL, 3)
    species: jnp.ndarray     # (D, NL) int32
    masses: jnp.ndarray      # (D, NL)
    atom_mask: jnp.ndarray   # (D, NL) bool
    # halo machinery, one entry per decomposed axis (stage); the stage-s
    # send lists index into the EXTENDED array after stages < s
    send_lo: Tuple[jnp.ndarray, ...]       # (D, S_s) int32
    send_lo_mask: Tuple[jnp.ndarray, ...]  # (D, S_s) bool
    send_hi: Tuple[jnp.ndarray, ...]
    send_hi_mask: Tuple[jnp.ndarray, ...]
    # dense neighbor slots: src indexes the EXTENDED array [owned | ghosts]
    edge_src: jnp.ndarray    # (D, NL, K) int32
    edge_shift: jnp.ndarray  # (D, NL, K, 3) wraps along non-decomposed axes
    edge_mask: jnp.ndarray   # (D, NL, K) bool
    nl_positions: jnp.ndarray  # (D, NL, 3)
    rng: jnp.ndarray         # (D, 2) uint32 per-device PRNG keys
    thermo: jnp.ndarray      # (D, 2, 3) Nose-Hoover chain (replicated)
    step: jnp.ndarray        # () int32
    nl_overflow: jnp.ndarray  # () bool (global)
    potential_energy: jnp.ndarray  # () global


def _pack(mask, cap, fill_idx=0):
    """Indices of True entries, packed to ``cap`` with validity mask."""
    n = mask.shape[0]
    order = jnp.argsort(~mask)  # stable: True entries first
    take = min(cap, n)
    idx = order[:take]
    if take < cap:
        idx = jnp.concatenate(
            [idx, jnp.full(cap - take, fill_idx, idx.dtype)]
        )
    valid = jnp.arange(cap) < jnp.sum(mask)
    overflow = jnp.sum(mask) > cap
    return jnp.where(valid, idx, fill_idx).astype(jnp.int32), valid, overflow




def _nhc_half_global(v, thermo, dt, temperature, tau, ndof, global_ke):
    """Half-step Nose-Hoover chain (M=3) on GLOBAL kinetic energy: the
    distributed counterpart of ``md/integrators._nhc_half`` — inputs are
    psum'd so the replicated chain state stays identical on every device."""
    kT = KB_EV * temperature
    ke2 = 2.0 * global_ke(v)
    xi, vxi = thermo[0], thermo[1]
    q1 = ndof * kT * tau * tau
    qj = kT * tau * tau
    Q = jnp.stack([q1, qj, qj])

    dt2, dt4, dt8 = dt / 2.0, dt / 4.0, dt / 8.0
    G2 = (Q[1] * vxi[1] ** 2 - kT) / Q[2]
    vxi = vxi.at[2].add(G2 * dt4)
    for j in (1, 0):
        vxi = vxi.at[j].multiply(jnp.exp(-dt8 * vxi[j + 1]))
        G = (
            (ke2 - ndof * kT) / Q[0]
            if j == 0
            else (Q[j - 1] * vxi[j - 1] ** 2 - kT) / Q[j]
        )
        vxi = vxi.at[j].add(G * dt4)
        vxi = vxi.at[j].multiply(jnp.exp(-dt8 * vxi[j + 1]))
    scale = jnp.exp(-dt2 * vxi[0])
    ke2 = ke2 * scale * scale
    xi = xi + dt2 * vxi
    for j in (0, 1):
        vxi = vxi.at[j].multiply(jnp.exp(-dt8 * vxi[j + 1]))
        G = (
            (ke2 - ndof * kT) / Q[0]
            if j == 0
            else (Q[j - 1] * vxi[j - 1] ** 2 - kT) / Q[j]
        )
        vxi = vxi.at[j].add(G * dt4)
        vxi = vxi.at[j].multiply(jnp.exp(-dt8 * vxi[j + 1]))
    G2 = (Q[1] * vxi[1] ** 2 - kT) / Q[2]
    vxi = vxi.at[2].add(G2 * dt4)
    return v * scale, jnp.stack([xi, vxi])


class DistributedMDEngine:
    """Brick-decomposed MD engine over a 1-3 axis mesh.

    Requires an orthogonal cell. ``axes`` maps mesh axes (in
    ``mesh.axis_names`` order) to cell axes; by default the longest cell
    axes are used. For a 1-D mesh the legacy ``axis`` argument is honored.
    """

    def __init__(
        self,
        spec: ModelSpec,
        params,
        cell: np.ndarray,
        mesh: Mesh,
        skin: float = 0.6,
        axis: Optional[int] = None,
        axes: Optional[Sequence[int]] = None,
        local_cap: Optional[int] = None,
        ghost_caps: Optional[Sequence[int]] = None,
        migrate_cap: Optional[int] = None,
        matmul_precision: str = "highest",
        fused: Optional[bool] = None,
    ):
        cell = np.asarray(cell, np.float64).reshape(3, 3)
        offdiag = cell - np.diag(np.diag(cell))
        assert np.abs(offdiag).max() < 1e-9, (
            "DistributedMDEngine requires an orthogonal cell"
        )
        self.spec = dataclasses.replace(spec, edge_dense_k=0, conv_fused=False)
        if fused is None:
            env = os.environ.get("SEVENNET_TPU_FUSED")
            if env is not None:
                fused = bool(int(env))
            else:
                fused = jax.default_backend() == "tpu"
        # fused Pallas conv over the extended (owned+ghost) set with the
        # scatter-add backward — the mirror-gather backward is unusable
        # here (domain boundaries break neighbor-list symmetry: a ghost
        # sender's reverse edge lives on the neighboring device)
        self.fused = bool(fused)
        self.params = params
        self.cell = cell
        self.mesh = mesh
        self.axis_names: Tuple[str, ...] = tuple(mesh.axis_names)
        self.dims: Tuple[int, ...] = tuple(
            mesh.devices.shape[i] for i in range(len(self.axis_names))
        )
        self.D = int(mesh.devices.size)
        self.n_stages = len(self.axis_names)
        assert 1 <= self.n_stages <= 3
        self.skin = float(skin)
        self.rc = float(spec.cutoff) + self.skin
        self.precision = matmul_precision
        lengths = np.diag(cell)
        if axes is None:
            if axis is not None and self.n_stages == 1:
                axes = (int(axis),)
            else:
                axes = tuple(
                    int(i) for i in np.argsort(-lengths)[: self.n_stages]
                )
        self.axes: Tuple[int, ...] = tuple(int(a) for a in axes)
        assert len(self.axes) == self.n_stages
        assert len(set(self.axes)) == self.n_stages
        self.L = tuple(float(lengths[a]) for a in self.axes)
        self.w = tuple(
            self.L[s] / self.dims[s] for s in range(self.n_stages)
        )
        for s in range(self.n_stages):
            assert self.w[s] >= self.rc or self.dims[s] == 1, (
                f"brick width {self.w[s]:.2f} along cell axis {self.axes[s]}"
                f" < cutoff+skin {self.rc:.2f}: use fewer devices or a "
                "bigger box"
            )
        self.axis = self.axes[0]  # legacy attribute
        self.local_cap = local_cap
        self.ghost_caps = list(ghost_caps) if ghost_caps else None
        self.migrate_cap = migrate_cap
        self.cl_spec: Optional[CellListSpec] = None
        self._run_cache: Dict = {}

    # ------------------------------------------------------------------
    # host-side initial decomposition (vectorized numpy)
    # ------------------------------------------------------------------
    def _owner_coords(self, frac: np.ndarray) -> np.ndarray:
        """(n, n_stages) integer brick coordinates from fractional pos."""
        out = np.zeros((len(frac), self.n_stages), int)
        for s, a in enumerate(self.axes):
            out[:, s] = np.minimum(
                (frac[:, a] * self.dims[s]).astype(int), self.dims[s] - 1
            )
        return out

    def _linear_device(self, coords: np.ndarray) -> np.ndarray:
        """Brick coords -> flattened device index (C order over mesh dims)."""
        lin = np.zeros(len(coords), int)
        for s in range(self.n_stages):
            lin = lin * self.dims[s] + coords[:, s]
        return lin

    def make_state(self, positions, atomic_numbers, temperature=None,
                   seed=0, velocities=None):
        pos = np.asarray(positions, np.float64)
        n = len(pos)
        frac = pos @ np.linalg.inv(self.cell)
        frac -= np.floor(frac)
        pos = frac @ self.cell
        coords = self._owner_coords(frac)
        owner = self._linear_device(coords)
        counts = np.bincount(owner, minlength=self.D)
        if self.local_cap is None:
            self.local_cap = int(-(-int(counts.max() * 1.3 + 8) // 8) * 8)
        NL = self.local_cap

        # per-stage ghost capacities: count atoms in each device's halo
        # band at stage s (the band of the brick EXTENDED by rc along all
        # previous stage axes), with margin
        if self.ghost_caps is None:
            self.ghost_caps = []
            for s in range(self.n_stages):
                a = self.axes[s]
                best = 8
                for d in range(self.D):
                    # unflatten d -> coords
                    rem, dc = d, []
                    for t in range(self.n_stages - 1, -1, -1):
                        dc.append(rem % self.dims[t])
                        rem //= self.dims[t]
                    dc = dc[::-1]
                    sel = np.ones(n, bool)
                    for t in range(s):
                        at = self.axes[t]
                        lo = dc[t] * self.w[t] - self.rc
                        hi = (dc[t] + 1) * self.w[t] + self.rc
                        c = pos[:, at]
                        Lt = self.L[t]
                        inside = (
                            ((c - lo) % Lt <= (hi - lo))
                            if self.dims[t] > 1 else np.ones(n, bool)
                        )
                        sel &= inside
                    if self.dims[s] == 1:
                        cnt = 0
                    else:
                        c = pos[sel][:, a]
                        lo_face = dc[s] * self.w[s]
                        hi_face = (dc[s] + 1) * self.w[s]
                        Ls = self.L[s]
                        near_lo = (lo_face - c) % Ls <= self.rc
                        near_hi = (c - hi_face) % Ls <= self.rc
                        cnt = max(int(near_lo.sum()), int(near_hi.sum()))
                    best = max(best, cnt)
                self.ghost_caps.append(
                    int(-(-int(best * 1.6 + 8) // 8) * 8)
                )
        if self.migrate_cap is None:
            self.migrate_cap = max(max(self.ghost_caps) // 2, 16)

        if self.cl_spec is None:
            # local frame cell: brick + two halos + decoupling gap along
            # every decomposed axis with >1 device
            fake = self.cell.copy()
            for s, a in enumerate(self.axes):
                if self.dims[s] > 1:
                    fake[a, a] = self.w[s] + 2 * self.rc + 2.2 * self.rc
            next_cap = NL + 2 * sum(self.ghost_caps)
            self.cl_spec = build_cell_list_spec(
                fake, next_cap, self.spec.cutoff, self.skin
            )
            # keep the full (N, K) slot grid (no edge compaction); the
            # fused kernels need K to be a multiple of 8 (lane tiling)
            kcap = self.cl_spec.neighbor_capacity
            if self.fused:
                kcap = -(-kcap // 8) * 8
            self.cl_spec = dataclasses.replace(
                self.cl_spec, edge_cap=0, neighbor_capacity=kcap
            )
            self.fake_cell = fake

        species = self.spec.z_to_type[np.asarray(atomic_numbers)]
        assert (species >= 0).all()
        masses = ATOMIC_MASSES[np.asarray(atomic_numbers)]

        rng = np.random.default_rng(seed)
        if velocities is not None:
            vel = np.asarray(velocities, np.float64)
        elif temperature is None:
            vel = np.zeros_like(pos)
        else:
            sigma = np.sqrt(KB_EV * temperature / masses) * np.sqrt(
                EV_A_AMU_TO_A_FS2
            )
            vel = rng.normal(size=pos.shape) * sigma[:, None]
            vel -= (masses[:, None] * vel).sum(0) / masses.sum()

        D, A = self.D, NL
        P_ = np.zeros((D, A, 3), np.float32)
        V = np.zeros((D, A, 3), np.float32)
        S = np.zeros((D, A), np.int32)
        M = np.ones((D, A), np.float32)
        msk = np.zeros((D, A), bool)
        for d in range(D):
            sel = np.flatnonzero(owner == d)
            assert len(sel) <= A, "local_cap too small"
            P_[d, : len(sel)] = pos[sel]
            V[d, : len(sel)] = vel[sel]
            S[d, : len(sel)] = species[sel]
            M[d, : len(sel)] = masses[sel]
            msk[d, : len(sel)] = True

        K = self.cl_spec.neighbor_capacity
        state = DistMDState(
            positions=jnp.asarray(P_),
            velocities=jnp.asarray(V),
            forces=jnp.zeros((D, A, 3), jnp.float32),
            species=jnp.asarray(S),
            masses=jnp.asarray(M),
            atom_mask=jnp.asarray(msk),
            send_lo=tuple(
                jnp.zeros((D, c), jnp.int32) for c in self.ghost_caps
            ),
            send_lo_mask=tuple(
                jnp.zeros((D, c), bool) for c in self.ghost_caps
            ),
            send_hi=tuple(
                jnp.zeros((D, c), jnp.int32) for c in self.ghost_caps
            ),
            send_hi_mask=tuple(
                jnp.zeros((D, c), bool) for c in self.ghost_caps
            ),
            edge_src=jnp.zeros((D, A, K), jnp.int32),
            edge_shift=jnp.zeros((D, A, K, 3), jnp.float32),
            edge_mask=jnp.zeros((D, A, K), bool),
            nl_positions=jnp.asarray(P_),
            rng=jax.vmap(
                lambda d: jax.random.fold_in(jax.random.PRNGKey(seed), d)
            )(jnp.arange(D, dtype=jnp.uint32)),
            thermo=jnp.zeros((D, 2, 3), jnp.float32),
            step=jnp.asarray(0, jnp.int32),
            nl_overflow=jnp.asarray(False),
            potential_energy=jnp.asarray(0.0, jnp.float32),
        )
        state = self._jit("init")(self.params, state)
        return state

    # ------------------------------------------------------------------
    # per-device pieces (called inside shard_map; named mesh axes)
    # ------------------------------------------------------------------
    def _perm(self, s: int, up: bool):
        Dv = self.dims[s]
        if up:
            return [(i, (i + 1) % Dv) for i in range(Dv)]
        return [(i, (i - 1) % Dv) for i in range(Dv)]

    def _exchange_stage(self, s, arr, send_lo, mlo, send_hi, mhi):
        """Ship masked rows of ``arr`` (indexed by the stage-s send lists)
        both ways along mesh axis s; returns (from_lo, from_hi)."""
        slo = arr[send_lo] * mlo.reshape(
            mlo.shape + (1,) * (arr.ndim - 1)
        ).astype(arr.dtype)
        shi = arr[send_hi] * mhi.reshape(
            mhi.shape + (1,) * (arr.ndim - 1)
        ).astype(arr.dtype)
        if self.dims[s] == 1:
            return shi, slo
        name = self.axis_names[s]
        from_lo = jax.lax.ppermute(shi, name, self._perm(s, up=True))
        from_hi = jax.lax.ppermute(slo, name, self._perm(s, up=False))
        return from_lo, from_hi

    def _ghost_masks_stage(self, s, mlo, mhi):
        if self.dims[s] == 1:
            return mhi, mlo
        name = self.axis_names[s]
        gml = jax.lax.ppermute(mhi, name, self._perm(s, up=True))
        gmh = jax.lax.ppermute(mlo, name, self._perm(s, up=False))
        return gml, gmh

    def _staged_ext(self, arr_owned, comm, correct_axis_pos=False):
        """Extend a per-atom array with all ghost stages:
        [owned | g0lo | g0hi | g1lo | g1hi | ...]. With
        ``correct_axis_pos`` the stage-s axis coordinate gets the periodic
        seam correction (positions only)."""
        ext = arr_owned
        dtype = arr_owned.dtype
        for s in range(self.n_stages):
            from_lo, from_hi = self._exchange_stage(
                s, ext, comm["send_lo"][s], comm["mlo"][s],
                comm["send_hi"][s], comm["mhi"][s],
            )
            if correct_axis_pos and self.dims[s] > 1:
                d = jax.lax.axis_index(self.axis_names[s])
                Lv = jnp.asarray(self.L[s], dtype)
                a = self.axes[s]
                corr_lo = jnp.where(d == 0, -Lv, 0.0)
                corr_hi = jnp.where(d == self.dims[s] - 1, Lv, 0.0)
                from_lo = from_lo.at[:, a].add(
                    corr_lo * comm["gmlo"][s].astype(dtype)
                )
                from_hi = from_hi.at[:, a].add(
                    corr_hi * comm["gmhi"][s].astype(dtype)
                )
            ext = jnp.concatenate([ext, from_lo, from_hi], axis=0)
        return ext

    def _to_local_frame(self, pos):
        out = pos
        for s, a in enumerate(self.axes):
            if self.dims[s] > 1:
                d = jax.lax.axis_index(self.axis_names[s])
                origin = d.astype(pos.dtype) * jnp.asarray(
                    self.w[s], pos.dtype
                )
                out = out.at[:, a].add(-(origin - self.rc))
        return out

    # ------------------------------------------------------------------
    def _migrate_axis(self, s, pos, vel, spc, mass, amask):
        """One axis pass of migration; returns updated arrays + overflow."""
        dtype = pos.dtype
        NL = pos.shape[0]
        a = self.axes[s]
        Dv = self.dims[s]
        wv = jnp.asarray(self.w[s], dtype)
        d = jax.lax.axis_index(self.axis_names[s])
        coord = pos[:, a]
        own = jnp.minimum((coord / wv).astype(jnp.int32), Dv - 1)
        rel = own - d
        stay = (rel == 0) & amask
        if Dv == 2:
            # lo and hi neighbors are the SAME device: rel=+-1 would match
            # both direction masks and duplicate the atom — send once
            go_lo = (rel != 0) & amask
            go_hi = jnp.zeros_like(go_lo)
        else:
            go_lo = ((rel == -1) | (rel == Dv - 1)) & amask
            go_hi = ((rel == 1) | (rel == -(Dv - 1))) & amask
        too_far = amask & ~(stay | go_lo | go_hi)
        Mcap = self.migrate_cap

        idx_l, vm_l, ofl_l = _pack(go_lo, Mcap)
        idx_r, vm_r, ofl_r = _pack(go_hi, Mcap)

        def bundle(idx, vm):
            return (
                pos[idx] * vm[:, None].astype(dtype),
                vel[idx] * vm[:, None].astype(dtype),
                jnp.where(vm, spc[idx], 0),
                jnp.where(vm, mass[idx], 1.0),
                vm,
            )

        pay_lo = bundle(idx_l, vm_l)
        pay_hi = bundle(idx_r, vm_r)
        if Dv == 1:
            arr_lo, arr_hi = pay_hi, pay_lo
        else:
            name = self.axis_names[s]
            arr_lo = jax.tree.map(
                lambda x: jax.lax.ppermute(x, name, self._perm(s, up=True)),
                pay_hi,
            )
            arr_hi = jax.tree.map(
                lambda x: jax.lax.ppermute(x, name, self._perm(s, up=False)),
                pay_lo,
            )

        order = jnp.argsort(~stay)
        n_stay = jnp.sum(stay)
        keep = jnp.arange(NL) < n_stay

        def compact(arr, fill=0.0):
            out = arr[order]
            shape = keep.shape + (1,) * (arr.ndim - 1)
            return jnp.where(
                keep.reshape(shape), out, jnp.asarray(fill, arr.dtype)
            )

        new_pos = compact(pos)
        new_vel = compact(vel)
        new_spc = compact(spc).astype(jnp.int32)
        new_mass = compact(mass, 1.0)

        n_arr_lo = jnp.sum(arr_lo[4])
        start_lo = n_stay
        start_hi = n_stay + n_arr_lo
        n_total = n_stay + n_arr_lo + jnp.sum(arr_hi[4])
        ofl_cap = n_total > NL

        def place(base, payload, vm, start):
            idxp, vmp, _ = _pack(vm, Mcap)
            slot = start + jnp.arange(Mcap)
            ok = vmp & (slot < NL)
            slot = jnp.where(ok, slot, NL - 1)
            src_rows = payload[idxp]
            shape = ok.shape + (1,) * (payload.ndim - 1)
            return base.at[slot].set(
                jnp.where(ok.reshape(shape), src_rows.astype(base.dtype),
                          base[slot])
            )

        for i, base in enumerate([new_pos, new_vel, new_spc, new_mass]):
            placed = place(base, arr_lo[i], arr_lo[4], start_lo)
            placed = place(placed, arr_hi[i], arr_hi[4], start_hi)
            if i == 0:
                new_pos = placed
            elif i == 1:
                new_vel = placed
            elif i == 2:
                new_spc = placed.astype(jnp.int32)
            else:
                new_mass = placed
        new_mask = jnp.arange(NL) < jnp.minimum(n_total, NL)
        ofl = jnp.any(too_far) | ofl_l | ofl_r | ofl_cap
        return new_pos, new_vel, new_spc, new_mass, new_mask, ofl

    def _rebuild_local(self, sl):
        """Migration (axis by axis) + send lists (staged) + local NL."""
        pos, vel = sl["positions"], sl["velocities"]
        spc, mass = sl["species"], sl["masses"]
        amask = sl["atom_mask"]
        dtype = pos.dtype
        NL = pos.shape[0]

        # ---- wrap ----
        inv = jnp.asarray(np.linalg.inv(self.cell), dtype)
        frac = pos @ inv
        frac = frac - jnp.floor(frac)
        pos = frac @ jnp.asarray(self.cell, dtype)

        # ---- migration: one pass per decomposed axis (diagonal moves
        # complete across the sequential passes) ----
        ofl = jnp.asarray(False)
        for s in range(self.n_stages):
            pos, vel, spc, mass, amask, o = self._migrate_axis(
                s, pos, vel, spc, mass, amask
            )
            ofl = ofl | o

        # ---- staged send lists ----
        send_lo: List = []
        mlo: List = []
        send_hi: List = []
        mhi: List = []
        gmlo: List = []
        gmhi: List = []
        ext_mask = amask
        # positions of the extended-so-far set (with seam corrections),
        # built incrementally so stage-s bands see earlier ghosts
        ext_pos = pos
        for s in range(self.n_stages):
            a = self.axes[s]
            d = jax.lax.axis_index(self.axis_names[s])
            wv = jnp.asarray(self.w[s], dtype)
            origin = d.astype(dtype) * wv
            c = ext_pos[:, a]
            cap = self.ghost_caps[s]
            if self.dims[s] > 1:
                band_lo = ext_mask & (c < origin + self.rc)
                band_hi = ext_mask & (c >= origin + wv - self.rc)
            else:
                band_lo = jnp.zeros_like(ext_mask)
                band_hi = jnp.zeros_like(ext_mask)
            slo, vlo, o1 = _pack(band_lo, cap)
            shi, vhi, o2 = _pack(band_hi, cap)
            ofl = ofl | o1 | o2
            gl, gh = self._ghost_masks_stage(s, vlo, vhi)
            send_lo.append(slo)
            mlo.append(vlo)
            send_hi.append(shi)
            mhi.append(vhi)
            gmlo.append(gl)
            gmhi.append(gh)
            # extend positions for the next stage's band selection
            from_lo, from_hi = self._exchange_stage(
                s, ext_pos, slo, vlo, shi, vhi
            )
            if self.dims[s] > 1:
                Lv = jnp.asarray(self.L[s], dtype)
                corr_lo = jnp.where(d == 0, -Lv, 0.0)
                corr_hi = jnp.where(d == self.dims[s] - 1, Lv, 0.0)
                from_lo = from_lo.at[:, a].add(corr_lo * gl.astype(dtype))
                from_hi = from_hi.at[:, a].add(corr_hi * gh.astype(dtype))
            ext_pos = jnp.concatenate([ext_pos, from_lo, from_hi], axis=0)
            ext_mask = jnp.concatenate([ext_mask, gl, gh], axis=0)

        # ---- local NL over the extended set ----
        loc = self._to_local_frame(ext_pos)
        src, dst, shift, emask, ofl_nl, _ = rebuild_neighbors(
            self.cl_spec, loc, jnp.asarray(self.fake_cell, dtype), ext_mask
        )
        K = self.cl_spec.neighbor_capacity
        Next = ext_pos.shape[0]
        src = src.reshape(Next, K)[:NL]
        shift = shift.reshape(Next, K, 3)[:NL]
        emask = emask.reshape(Next, K)[:NL]
        # any owned edge wrapping a decomposed axis means the gap failed
        ofl_gap = jnp.asarray(False)
        for s, a in enumerate(self.axes):
            if self.dims[s] > 1:
                ofl_gap = ofl_gap | jnp.any(
                    (jnp.abs(shift[..., a]) > 0.5) & emask
                )

        sl = dict(sl)
        sl.update(
            positions=pos, velocities=vel, species=spc, masses=mass,
            atom_mask=amask,
            send_lo=tuple(send_lo), mlo=tuple(mlo),
            send_hi=tuple(send_hi), mhi=tuple(mhi),
            edge_src=src, edge_shift=shift, edge_mask=emask,
            nl_positions=pos,
        )
        return sl, ofl | ofl_nl | ofl_gap

    # ------------------------------------------------------------------
    def _comm_from_state(self, sl):
        """Per-device comm dict (ghost masks + ghost species are static per
        rebuild)."""
        gmlo, gmhi = [], []
        for s in range(self.n_stages):
            gl, gh = self._ghost_masks_stage(s, sl["mlo"][s], sl["mhi"][s])
            gmlo.append(gl)
            gmhi.append(gh)
        return {
            "atom_mask": sl["atom_mask"],
            "species": sl["species"],
            "send_lo": sl["send_lo"], "mlo": sl["mlo"],
            "send_hi": sl["send_hi"], "mhi": sl["mhi"],
            "gmlo": tuple(gmlo), "gmhi": tuple(gmhi),
            "edge_src": sl["edge_src"],
            "edge_shift": sl["edge_shift"],
            "edge_mask": sl["edge_mask"],
        }

    def _local_energy(self, params, comm, pos, eps):
        """Per-device atomic energy with per-layer staged feature halos."""
        spec = self.spec
        dtype = pos.dtype
        NL = pos.shape[0]
        K = self.cl_spec.neighbor_capacity
        amask = comm["atom_mask"].astype(dtype)
        emask = comm["edge_mask"].reshape(-1)
        src = comm["edge_src"].reshape(-1)
        dst = jnp.repeat(jnp.arange(NL, dtype=jnp.int32), K)
        shift = comm["edge_shift"].reshape(-1, 3)

        ext_pos = self._staged_ext(pos, comm, correct_axis_pos=True)
        cell = jnp.asarray(self.cell, dtype)
        ev = ext_pos[src] - pos[dst] + shift @ cell
        ev = ev + ev @ eps
        ev = jnp.where(emask[:, None], ev, jnp.array([1.0, 0.0, 0.0], dtype))

        r = jnp.linalg.norm(ev, axis=-1)
        basis = bessel_basis(
            r, params["edge_embedding"]["bessel_coeffs"], spec.cutoff
        )
        env = _cutoff_envelope(spec, r)
        edge_emb = basis * (env * emask.astype(dtype))[:, None]
        sh = spherical_harmonics(spec.lmax_edge, ev, normalize=spec.normalize_sph)

        onehot = jax.nn.one_hot(comm["species"], spec.num_species, dtype=dtype)

        x = linear_apply(
            spec.embed_linear, params["onehot_to_feature_x"], onehot
        )
        for layer in spec.layers:
            t = layer.t
            if layer.sc_type == "nequip":
                sc = fctp_apply(
                    layer.sc_fctp, params[f"{t}_self_connection_intro"], x,
                    onehot,
                )
            elif layer.sc_type == "linear":
                sc = linear_apply(
                    layer.sc_linear, params[f"{t}_self_connection_intro"], x
                )
            else:
                sc = None
            x1 = linear_apply(layer.si1, params[f"{t}_self_interaction_1"], x)
            x_ext = self._staged_ext(x1, comm)
            if self.fused:
                # Pallas kernels over the (NL, K) slot grid; senders index
                # the extended set, so the scatter-add backward's ghost-row
                # cotangents ride the halo exchange's transpose back home
                from ..ops.fused_conv import fused_conv_apply_ext

                xc = fused_conv_apply_ext(
                    layer.conv, layer.radial_mlp,
                    params[f"{t}_convolution"]["weight_nn"],
                    x_ext,
                    edge_emb.reshape(NL, K, -1),
                    sh.reshape(NL, K, -1),
                    comm["edge_src"],
                    param_grads=False,
                )
            else:
                w = scalar_mlp_apply(
                    layer.radial_mlp, params[f"{t}_convolution"]["weight_nn"],
                    edge_emb,
                )
                msg = conv_tp_apply(layer.conv, x_ext[src], sh, w)
                xc = jax.ops.segment_sum(
                    msg, dst, num_segments=NL, indices_are_sorted=True
                )
            xc = xc / params[f"{t}_convolution"]["denominator"][0]
            xc = linear_apply(layer.si2, params[f"{t}_self_interaction_2"], xc)
            if sc is not None:
                xc = xc + sc
            x = gate_apply(layer.gate, xc)

        if spec.readout_as_fcn:
            e_scaled = scalar_mlp_apply(spec.readout_fcn, params["readout_FCN"], x)
        else:
            h = linear_apply(spec.readout1, params["reduce_input_to_hidden"], x)
            e_scaled = linear_apply(
                spec.readout2, params["reduce_hidden_to_energy"], h
            )
        e_scaled = e_scaled[:, 0]
        rs = params["rescale_atomic_energy"]
        if spec.rescale_mode == "species":
            shift_v = rs["shift"][comm["species"]]
            scale_v = rs["scale"][comm["species"]]
        else:
            shift_v = rs["shift"][0]
            scale_v = rs["scale"][0]
        return (e_scaled * scale_v + shift_v) * amask

    # ------------------------------------------------------------------
    # jitted drivers
    # ------------------------------------------------------------------
    def _state_fields(self):
        return [
            "positions", "velocities", "forces", "species", "masses",
            "atom_mask", "send_lo", "mlo", "send_hi", "mhi",
            "edge_src", "edge_shift", "edge_mask", "nl_positions",
            "rng", "thermo",
        ]

    def _split(self, state: DistMDState):
        return {
            "positions": state.positions,
            "velocities": state.velocities,
            "forces": state.forces,
            "species": state.species,
            "masses": state.masses,
            "atom_mask": state.atom_mask,
            "send_lo": state.send_lo,
            "mlo": state.send_lo_mask,
            "send_hi": state.send_hi,
            "mhi": state.send_hi_mask,
            "edge_src": state.edge_src,
            "edge_shift": state.edge_shift,
            "edge_mask": state.edge_mask,
            "nl_positions": state.nl_positions,
            "rng": state.rng,
            "thermo": state.thermo,
        }

    def _merge(self, state: DistMDState, stack) -> DistMDState:
        return state.replace(
            positions=stack["positions"], velocities=stack["velocities"],
            forces=stack["forces"], species=stack["species"],
            masses=stack["masses"], atom_mask=stack["atom_mask"],
            send_lo=stack["send_lo"], send_lo_mask=stack["mlo"],
            send_hi=stack["send_hi"], send_hi_mask=stack["mhi"],
            edge_src=stack["edge_src"], edge_shift=stack["edge_shift"],
            edge_mask=stack["edge_mask"], nl_positions=stack["nl_positions"],
            rng=stack["rng"], thermo=stack["thermo"],
        )

    def _psum_all(self, x):
        return jax.lax.psum(x, self.axis_names)

    def _jit(self, kind, n_steps=0, dt=0.0, integrator="nve", **kw):
        key = (kind, n_steps, dt, integrator, tuple(sorted(kw.items())))
        if key in self._run_cache:
            return self._run_cache[key]

        from jax import shard_map

        mesh_spec = P(*self.axis_names)

        def energy_forces(params, sl):
            comm = self._comm_from_state(sl)

            # Differentiate the LOCAL energy sum only: every device runs
            # the same reverse pass, and the ppermute transposes route each
            # device's ghost cotangents back to their owners — collectively
            # that is d(sum_d E_d)/d pos_local, the reference's
            # reverse_comm (pair_e3gnn_parallel.cpp:404-441). Do NOT psum
            # before grad: with check_vma=False the psum transpose would
            # multiply the (replicated) cotangent by D.
            def etot(p):
                with jax.default_matmul_precision(self.precision):
                    e = self._local_energy(
                        params, comm, p, jnp.zeros((3, 3), p.dtype)
                    )
                return jnp.sum(e)

            e_loc, g = jax.value_and_grad(etot)(sl["positions"])
            e = self._psum_all(e_loc)
            forces = -g * sl["atom_mask"][:, None].astype(g.dtype)
            return e, forces

        def rebuild(sl):
            return self._rebuild_local(sl)

        def one_step(params, sl, ofl_acc):
            disp = sl["positions"] - sl["nl_positions"]
            local_need = jnp.any(
                jnp.sum(disp * disp, -1)
                * sl["atom_mask"] > (self.skin / 2.0) ** 2
            )
            need = self._psum_all(local_need.astype(jnp.int32)) > 0

            sl, ofl = jax.lax.cond(
                need, rebuild, lambda s: (dict(s), jnp.asarray(False)), sl
            )
            ofl_acc = ofl_acc | (
                self._psum_all(ofl.astype(jnp.int32)) > 0
            )

            mask = sl["atom_mask"][:, None]

            def accel(f):
                return f / sl["masses"][:, None] * EV_A_AMU_TO_A_FS2 * mask

            def local_ke(v):
                return 0.5 * jnp.sum(
                    sl["masses"][:, None] * v ** 2 * mask
                ) / EV_A_AMU_TO_A_FS2

            def global_ke(v):
                return self._psum_all(local_ke(v))

            ndof = 3.0 * jnp.maximum(
                self._psum_all(jnp.sum(sl["atom_mask"])), 1
            ).astype(sl["positions"].dtype)

            if integrator in ("nose_hoover", "nvt"):
                # Nose-Hoover chain with GLOBAL kinetic energy: the chain
                # state is replicated (identical psum'd inputs on every
                # device), mirroring the serial md/integrators.py chain
                temperature = kw["temperature"]
                tau = kw.get("tau", 50.0)
                sl["velocities"], sl["thermo"] = _nhc_half_global(
                    sl["velocities"], sl["thermo"], dt, temperature, tau,
                    ndof, global_ke,
                )

            if integrator == "langevin":
                # BAOAB with per-device noise streams
                temperature = kw["temperature"]
                friction = kw.get("friction", 0.01)
                v = sl["velocities"] + 0.5 * dt * accel(sl["forces"])
                x = sl["positions"] + 0.5 * dt * v * mask
                rng, key = jax.random.split(sl["rng"])
                c1 = jnp.exp(-friction * dt)
                sigma = jnp.sqrt(
                    (1.0 - c1 ** 2) * KB_EV * temperature / sl["masses"]
                ) * jnp.sqrt(EV_A_AMU_TO_A_FS2)
                noise = jax.random.normal(key, v.shape, dtype=v.dtype)
                v = c1 * v + sigma[:, None] * noise
                sl["positions"] = x + 0.5 * dt * v * mask
                sl["rng"] = rng
                e, forces = energy_forces(params, sl)
                sl["velocities"] = (
                    v + 0.5 * dt * accel(forces)
                ) * mask
                sl["forces"] = forces
            else:
                # velocity Verlet core (nve / the NVT wrap above)
                v_half = sl["velocities"] + 0.5 * dt * accel(sl["forces"])
                sl["positions"] = sl["positions"] + dt * v_half * mask
                e, forces = energy_forces(params, sl)
                sl["velocities"] = (
                    v_half + 0.5 * dt * accel(forces)
                ) * mask
                sl["forces"] = forces

            if integrator in ("nose_hoover", "nvt"):
                sl["velocities"], sl["thermo"] = _nhc_half_global(
                    sl["velocities"], sl["thermo"], dt, kw["temperature"],
                    kw.get("tau", 50.0), ndof, global_ke,
                )

            ke = global_ke(sl["velocities"])
            return sl, e, ke, ofl_acc

        lead = (1,) * self.n_stages

        def local_of(stack):
            # inside shard_map each block has n_stages leading size-1 dims
            return jax.tree.map(
                lambda a: a.reshape(a.shape[self.n_stages:]), stack
            )

        def stackify(sl):
            return jax.tree.map(lambda a: a.reshape(lead + a.shape), sl)

        def scalarify(x):
            return x.reshape(lead + x.shape)

        if kind == "stress":
            def body(params, stack):
                sl = local_of(stack)
                comm = self._comm_from_state(sl)

                def etot(p, eps):
                    with jax.default_matmul_precision(self.precision):
                        e = self._local_energy(params, comm, p, eps)
                    return jnp.sum(e)

                eps0 = jnp.zeros((3, 3), sl["positions"].dtype)
                e_loc, (gp, geps) = jax.value_and_grad(
                    etot, argnums=(0, 1)
                )(sl["positions"], eps0)
                # eps enters AFTER the halo exchange (edge vectors are
                # local), so its gradient is purely local — psum sums the
                # per-device virials
                e = self._psum_all(e_loc)
                geps = self._psum_all(geps)
                forces = -gp * sl["atom_mask"][:, None].astype(gp.dtype)
                vol = jnp.abs(jnp.linalg.det(
                    jnp.asarray(self.cell, gp.dtype)
                ))
                stress = -jnp.stack([
                    geps[0, 0], geps[1, 1], geps[2, 2],
                    geps[0, 1], geps[1, 2], geps[2, 0],
                ]) / vol
                return scalarify(e), scalarify(stress), stackify(
                    {"forces": forces}
                )

            sm = shard_map(
                body, mesh=self.mesh,
                in_specs=(P(), mesh_spec),
                out_specs=(mesh_spec, mesh_spec, mesh_spec),
                check_vma=False,
            )

            def run(params, state):
                stack_in = jax.tree.map(
                    lambda a: a.reshape(self.dims + a.shape[1:]),
                    self._split(state),
                )
                e, stress, fstack = sm(params, stack_in)
                forces = fstack["forces"].reshape(
                    (self.D,) + fstack["forces"].shape[self.n_stages:]
                )
                return (
                    e.reshape(-1)[0],
                    stress.reshape(-1, 6)[0],
                    forces,
                )

            fn = jax.jit(run)
        elif kind == "init":
            def body(params, stack):
                sl = local_of(stack)
                sl, ofl = rebuild(sl)
                e, forces = energy_forces(params, sl)
                sl["forces"] = forces
                return stackify(sl), scalarify(e), scalarify(ofl)

            sm = shard_map(
                body, mesh=self.mesh,
                in_specs=(P(), mesh_spec),
                out_specs=(mesh_spec, mesh_spec, mesh_spec),
                check_vma=False,
            )

            def run(params, state):
                stack_in = jax.tree.map(
                    lambda a: a.reshape(self.dims + a.shape[1:]),
                    self._split(state),
                )
                stack, e, ofl = sm(params, stack_in)
                stack = jax.tree.map(
                    lambda a: a.reshape((self.D,) + a.shape[self.n_stages:]),
                    stack,
                )
                return self._merge(state, stack).replace(
                    potential_energy=e.reshape(-1)[0],
                    nl_overflow=state.nl_overflow | ofl.any(),
                )

            fn = jax.jit(run)
        elif kind == "run":
            def body(params, stack):
                sl = local_of(stack)

                def scan_body(carry, _):
                    sl, ofl = carry
                    sl, e, ke, ofl = one_step(params, sl, ofl)
                    return (sl, ofl), (e, ke)

                (sl, ofl), (pe, ke) = jax.lax.scan(
                    scan_body, (sl, jnp.asarray(False)), None,
                    length=n_steps,
                )
                return stackify(sl), scalarify(pe), scalarify(ke), scalarify(ofl)

            sm = shard_map(
                body, mesh=self.mesh,
                in_specs=(P(), mesh_spec),
                out_specs=(mesh_spec, mesh_spec, mesh_spec, mesh_spec),
                check_vma=False,
            )

            def run(params, state):
                stack_in = jax.tree.map(
                    lambda a: a.reshape(self.dims + a.shape[1:]),
                    self._split(state),
                )
                stack, pe, ke, ofl = sm(params, stack_in)
                stack = jax.tree.map(
                    lambda a: a.reshape((self.D,) + a.shape[self.n_stages:]),
                    stack,
                )
                pe = pe.reshape(self.D, -1)
                ke = ke.reshape(self.D, -1)
                return (
                    self._merge(state, stack).replace(
                        potential_energy=pe[0, -1],
                        step=state.step + n_steps,
                        nl_overflow=state.nl_overflow | ofl.any(),
                    ),
                    (pe[0], ke[0]),
                )

            fn = jax.jit(run)
        else:
            raise ValueError(kind)
        self._run_cache[key] = fn
        return fn

    def run(self, state: DistMDState, n_steps: int, dt: float = 1.0,
            chunk: int = 10, integrator: str = "nve", **kw):
        """Distributed MD: ``integrator`` in nve | langevin |
        nose_hoover/nvt (pass ``temperature``, optional ``friction`` /
        ``tau``); the Nose-Hoover chain thermostats the GLOBAL kinetic
        energy, Langevin uses independent per-device noise streams."""
        pes, kes = [], []
        for length in [chunk] * (n_steps // chunk) + (
            [n_steps % chunk] if n_steps % chunk else []
        ):
            fn = self._jit(
                "run", n_steps=length, dt=float(dt),
                integrator=integrator, **kw,
            )
            state, (pe, ke) = fn(self.params, state)
            pes.append(pe)
            kes.append(ke)
        if bool(state.nl_overflow):
            raise RuntimeError(
                "distributed MD overflow: grow local/ghost/migrate capacities"
            )
        return state, (jnp.concatenate(pes), jnp.concatenate(kes))

    def compute_stress(self, state: DistMDState):
        """Single-point global (energy, voigt stress, per-device forces):
        strain-probe virial with psum'd per-device contributions (the
        edge-local formulation keeps it exact under decomposition, like
        the reference's per-edge virial, force_output.py:197-228)."""
        fn = self._jit("stress")
        e, stress, forces = fn(self.params, state)
        return e, stress, forces

    # convenience: gather owned atoms back to host (order not preserved)
    def gather_positions(self, state: DistMDState):
        pos = np.asarray(state.positions)
        msk = np.asarray(state.atom_mask)
        return pos[msk]
