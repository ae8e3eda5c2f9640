"""Distributed (domain-decomposed) MD over a device mesh — the TPU-native
counterpart of the reference's parallel LAMMPS pair style
(``pair_e3gnn_parallel.cpp:194-506`` + the modified CommBrick halo exchange,
``comm_brick.cpp:1057-1123``), redesigned for SPMD:

- 1-D slab decomposition along one axis of an ORTHOGONAL cell; each device
  owns the atoms in its slab (fixed capacity + mask).
- Per step: ghost POSITIONS are refreshed with two ``lax.ppermute`` calls
  (the CommBrick forward_comm analogue over ICI), then the energy is
  evaluated with a per-layer ghost FEATURE halo (the JCTC layer-synchronous
  scheme); forces come from ``jax.grad`` of the psum'd local energy — AD
  transposes the ppermutes, which IS the reverse_comm accumulation
  (``:404-441``) without hand-written code.
- Neighbor rebuild + ATOM MIGRATION run inside the jitted step under a
  globally-agreed ``lax.cond`` (psum'd skin trigger): migrants pack into
  fixed-capacity buffers, ppermute to adjacent slabs, and compact into the
  owner's free slots; the per-domain cell list runs on the extended
  (owned + ghost) set in a padded local frame so the existing jit cell
  list (md/neighbor.py) is reused unchanged.
- All capacity violations raise the overflow flag for the host to rebuild
  with bigger capacities (the static-shape analogue of LAMMPS' dynamic
  growth; cf. ``pair_e3gnn.cpp:283-288``).

Works on any 1-D mesh — 8 virtual CPU devices in tests, ICI on a pod.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

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
    """Per-device stacked MD state (leading axis = device)."""

    positions: jnp.ndarray   # (D, NL, 3) global coords, wrapped
    velocities: jnp.ndarray  # (D, NL, 3)
    forces: jnp.ndarray      # (D, NL, 3)
    species: jnp.ndarray     # (D, NL) int32
    masses: jnp.ndarray      # (D, NL)
    atom_mask: jnp.ndarray   # (D, NL) bool
    # halo machinery (rebuilt with the NL)
    send_left: jnp.ndarray   # (D, S) int32 local indices
    send_left_mask: jnp.ndarray
    send_right: jnp.ndarray
    send_right_mask: jnp.ndarray
    # dense neighbor slots: src indexes the EXTENDED array [owned | gL | gR]
    edge_src: jnp.ndarray    # (D, NL, K) int32
    edge_shift: jnp.ndarray  # (D, NL, K, 3) in-plane wraps (axis comp 0)
    edge_mask: jnp.ndarray   # (D, NL, K) bool
    nl_positions: jnp.ndarray  # (D, NL, 3)
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


class DistributedMDEngine:
    """Slab-decomposed MD engine over a 1-D 'dd' mesh.

    Requires an orthogonal cell; the slab axis defaults to the longest one.
    """

    def __init__(
        self,
        spec: ModelSpec,
        params,
        cell: np.ndarray,
        mesh: Mesh,
        skin: float = 0.6,
        axis: Optional[int] = None,
        local_cap: Optional[int] = None,
        ghost_cap: Optional[int] = None,
        migrate_cap: Optional[int] = None,
        matmul_precision: str = "highest",
    ):
        cell = np.asarray(cell, np.float64).reshape(3, 3)
        offdiag = cell - np.diag(np.diag(cell))
        assert np.abs(offdiag).max() < 1e-9, (
            "DistributedMDEngine requires an orthogonal cell"
        )
        self.spec = dataclasses.replace(spec, edge_dense_k=0, conv_fused=False)
        self.params = params
        self.cell = cell
        self.mesh = mesh
        self.D = mesh.devices.size
        self.skin = float(skin)
        self.rc = float(spec.cutoff) + self.skin
        self.precision = matmul_precision
        lengths = np.diag(cell)
        self.axis = int(np.argmax(lengths)) if axis is None else int(axis)
        self.L = float(lengths[self.axis])
        self.w = self.L / self.D
        assert self.w >= self.rc, (
            f"slab width {self.w:.2f} < cutoff+skin {self.rc:.2f}: "
            "use fewer devices or a bigger box"
        )
        self.local_cap = local_cap
        self.ghost_cap = ghost_cap
        self.migrate_cap = migrate_cap
        self.cl_spec: Optional[CellListSpec] = None
        self._run_cache: Dict = {}

    # ------------------------------------------------------------------
    # host-side initial decomposition (vectorized numpy)
    # ------------------------------------------------------------------
    def make_state(self, positions, atomic_numbers, temperature=None,
                   seed=0, velocities=None):
        pos = np.asarray(positions, np.float64)
        n = len(pos)
        frac = pos @ np.linalg.inv(self.cell)
        frac -= np.floor(frac)
        pos = frac @ self.cell
        owner = np.minimum(
            (frac[:, self.axis] * self.D).astype(int), self.D - 1
        )
        counts = np.bincount(owner, minlength=self.D)
        if self.local_cap is None:
            self.local_cap = int(-(-int(counts.max() * 1.3 + 8) // 8) * 8)
        NL = self.local_cap
        # ghost capacity: atoms within rc of a slab face, with margin
        band = np.minimum(
            frac[:, self.axis] * self.L % self.w,
            self.w - (frac[:, self.axis] * self.L % self.w),
        )
        per_face = max(
            int(np.sum(band < self.rc) / max(self.D, 1)), 8
        )
        if self.ghost_cap is None:
            self.ghost_cap = int(-(-int(per_face * 1.6 + 8) // 8) * 8)
        if self.migrate_cap is None:
            self.migrate_cap = max(self.ghost_cap // 2, 16)
        if self.cl_spec is None:
            # local frame cell: slab + two halos + decoupling gap
            z_ext = self.w + 2 * self.rc + 2.2 * self.rc
            fake = self.cell.copy()
            fake[self.axis, self.axis] = z_ext
            next_cap = NL + 2 * self.ghost_cap
            self.cl_spec = build_cell_list_spec(
                fake, next_cap, self.spec.cutoff, self.skin
            )
            # keep the full (N, K) slot grid (no edge compaction): the
            # engine reshapes NL rows out of it per rebuild
            self.cl_spec = dataclasses.replace(self.cl_spec, edge_cap=0)
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
        Scap = self.ghost_cap
        state = DistMDState(
            positions=jnp.asarray(P_),
            velocities=jnp.asarray(V),
            forces=jnp.zeros((D, A, 3), jnp.float32),
            species=jnp.asarray(S),
            masses=jnp.asarray(M),
            atom_mask=jnp.asarray(msk),
            send_left=jnp.zeros((D, Scap), jnp.int32),
            send_left_mask=jnp.zeros((D, Scap), bool),
            send_right=jnp.zeros((D, Scap), jnp.int32),
            send_right_mask=jnp.zeros((D, Scap), bool),
            edge_src=jnp.zeros((D, A, K), jnp.int32),
            edge_shift=jnp.zeros((D, A, K, 3), jnp.float32),
            edge_mask=jnp.zeros((D, A, K), bool),
            nl_positions=jnp.asarray(P_),
            step=jnp.asarray(0, jnp.int32),
            nl_overflow=jnp.asarray(False),
            potential_energy=jnp.asarray(0.0, jnp.float32),
        )
        state = self._jit("init")(self.params, state)
        return state

    # ------------------------------------------------------------------
    # per-device pieces (called inside shard_map; axis name 'dd')
    # ------------------------------------------------------------------
    def _axis_origin(self, dtype):
        d = jax.lax.axis_index("dd")
        return (d.astype(dtype)) * jnp.asarray(self.w, dtype)

    def _exchange(self, arr, send_l, ml, send_r, mr):
        """Ship masked owned rows both ways; returns (from_left, from_right)
        each (S, ...)."""
        sl = arr[send_l] * ml.reshape(ml.shape + (1,) * (arr.ndim - 1)).astype(
            arr.dtype
        )
        sr = arr[send_r] * mr.reshape(mr.shape + (1,) * (arr.ndim - 1)).astype(
            arr.dtype
        )
        if self.D == 1:
            return sr, sl
        perm_r = [(i, (i + 1) % self.D) for i in range(self.D)]
        perm_l = [(i, (i - 1) % self.D) for i in range(self.D)]
        from_left = jax.lax.ppermute(sr, "dd", perm_r)
        from_right = jax.lax.ppermute(sl, "dd", perm_l)
        return from_left, from_right

    def _ghost_positions(self, state_pos, send_l, ml, send_r, mr, gml, gmr):
        """Per-step ghost position refresh (+ periodic seam correction)."""
        dtype = state_pos.dtype
        from_left, from_right = self._exchange(state_pos, send_l, ml, send_r, mr)
        d = jax.lax.axis_index("dd")
        Lv = jnp.asarray(self.L, dtype)
        corr_l = jnp.where(d == 0, -Lv, 0.0)   # left neighbor wraps down
        corr_r = jnp.where(d == self.D - 1, Lv, 0.0)
        ax = self.axis
        from_left = from_left.at[:, ax].add(corr_l * gml.astype(dtype))
        from_right = from_right.at[:, ax].add(corr_r * gmr.astype(dtype))
        return jnp.concatenate([from_left, from_right], axis=0)

    def _ghost_masks(self, ml, mr):
        """Validity of ghost rows after exchange (static per rebuild)."""
        if self.D == 1:
            return mr, ml
        perm_r = [(i, (i + 1) % self.D) for i in range(self.D)]
        perm_l = [(i, (i - 1) % self.D) for i in range(self.D)]
        gml = jax.lax.ppermute(mr, "dd", perm_r)
        gmr = jax.lax.ppermute(ml, "dd", perm_l)
        return gml, gmr

    def _to_local_frame(self, pos, origin):
        ax = self.axis
        out = pos.at[:, ax].add(-(origin - self.rc))
        return out

    def _rebuild_local(self, comm, pos, vel, spc, mass, amask):
        """Migration + send lists + local NL. Runs inside shard_map."""
        dtype = pos.dtype
        ax = self.axis
        NL = pos.shape[0]
        Lv = jnp.asarray(self.L, dtype)
        wv = jnp.asarray(self.w, dtype)
        d = jax.lax.axis_index("dd")

        # ---- wrap + ownership ----
        inv = jnp.asarray(np.linalg.inv(self.cell), dtype)
        frac = pos @ inv
        frac = frac - jnp.floor(frac)
        pos = frac @ jnp.asarray(self.cell, dtype)
        coord = pos[:, ax]
        owner = jnp.minimum(
            (coord / wv).astype(jnp.int32), self.D - 1
        )
        rel = owner - d  # would-be migration offset
        stay = (rel == 0) & amask
        go_l = ((rel == -1) | (rel == self.D - 1)) & amask
        go_r = ((rel == 1) | (rel == -(self.D - 1))) & amask
        too_far = amask & ~(stay | go_l | go_r)
        Mcap = self.migrate_cap

        idx_l, vm_l, ofl_l = _pack(go_l, Mcap)
        idx_r, vm_r, ofl_r = _pack(go_r, Mcap)

        # bundle migrant payloads
        def bundle(idx, vm):
            return (
                pos[idx] * vm[:, None].astype(dtype),
                vel[idx] * vm[:, None].astype(dtype),
                jnp.where(vm, spc[idx], 0),
                jnp.where(vm, mass[idx], 1.0),
                vm,
            )

        pay_l = bundle(idx_l, vm_l)
        pay_r = bundle(idx_r, vm_r)
        if self.D == 1:
            arr_l, arr_r = pay_r, pay_l
        else:
            perm_r = [(i, (i + 1) % self.D) for i in range(self.D)]
            perm_l = [(i, (i - 1) % self.D) for i in range(self.D)]
            arr_l = jax.tree.map(
                lambda a: jax.lax.ppermute(a, "dd", perm_r), pay_r
            )
            arr_r = jax.tree.map(
                lambda a: jax.lax.ppermute(a, "dd", perm_l), pay_l
            )

        # ---- compact stayers, append arrivals ----
        order = jnp.argsort(~stay)
        n_stay = jnp.sum(stay)
        keep = jnp.arange(NL) < n_stay

        def compact(arr, fill=0.0):
            out = arr[order]
            shape = keep.shape + (1,) * (arr.ndim - 1)
            k = keep.reshape(shape)
            return jnp.where(k, out, jnp.asarray(fill, arr.dtype))

        new_pos = compact(pos)
        new_vel = compact(vel)
        new_spc = compact(spc).astype(jnp.int32)
        new_mass = compact(mass, 1.0)
        new_mask = keep

        # scatter arrivals into free slots [n_stay ...]
        n_arr_l = jnp.sum(arr_l[4])
        start_l = n_stay
        start_r = n_stay + n_arr_l
        ofl_cap = (n_stay + n_arr_l + jnp.sum(arr_r[4])) > NL

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

        for i, (base, fill) in enumerate(
            [(new_pos, 0.0), (new_vel, 0.0), (new_spc, 0), (new_mass, 1.0)]
        ):
            placed_l = place(base, arr_l[i], arr_l[4], start_l)
            placed = place(placed_l, arr_r[i], arr_r[4], start_r)
            if i == 0:
                new_pos = placed
            elif i == 1:
                new_vel = placed
            elif i == 2:
                new_spc = placed.astype(jnp.int32)
            else:
                new_mass = placed
        arrivals = jnp.arange(NL)
        new_mask = arrivals < (n_stay + n_arr_l + jnp.sum(arr_r[4]))
        new_mask = new_mask & (arrivals < NL)

        # ---- send lists (halo bands) ----
        origin = d.astype(dtype) * wv
        c = new_pos[:, ax]
        band_l = new_mask & (c < origin + self.rc)
        band_r = new_mask & (c >= origin + wv - self.rc)
        Scap = self.send_cap
        send_l, ml, ofl_sl = _pack(band_l, Scap)
        send_r, mr, ofl_sr = _pack(band_r, Scap)
        gml, gmr = self._ghost_masks(ml, mr)

        # ---- local NL over the extended set ----
        gpos = self._ghost_positions(new_pos, send_l, ml, send_r, mr, gml, gmr)
        ext_pos = jnp.concatenate([new_pos, gpos], axis=0)
        ext_mask = jnp.concatenate([new_mask, gml, gmr], axis=0)
        loc = self._to_local_frame(ext_pos, origin)
        src, dst, shift, emask, ofl_nl, _ = rebuild_neighbors(
            self.cl_spec, loc, jnp.asarray(self.fake_cell, dtype), ext_mask
        )
        K = self.cl_spec.neighbor_capacity
        Next = ext_pos.shape[0]
        src = src.reshape(Next, K)[:NL]
        shift = shift.reshape(Next, K, 3)[:NL]
        emask = emask.reshape(Next, K)[:NL]
        # any neighbor-of-owned edge with an axis wrap means the gap failed
        ofl_gap = jnp.any(
            (jnp.abs(shift[..., ax]) > 0.5) & emask
        )

        overflow = (
            jnp.any(too_far) | ofl_l | ofl_r | ofl_cap | ofl_sl | ofl_sr
            | ofl_nl | ofl_gap
        )
        return (
            new_pos, new_vel, new_spc, new_mass, new_mask,
            send_l, ml, send_r, mr, src, shift, emask, overflow,
        )

    # ------------------------------------------------------------------
    @property
    def send_cap(self):
        return self.ghost_cap

    def _local_energy(self, params, comm, pos, eps):
        """Per-device atomic energy with per-layer feature halos."""
        spec = self.spec
        dtype = pos.dtype
        NL = pos.shape[0]
        K = self.cl_spec.neighbor_capacity
        amask = comm["atom_mask"].astype(dtype)
        emask = comm["edge_mask"].reshape(-1)
        src = comm["edge_src"].reshape(-1)
        dst = jnp.repeat(jnp.arange(NL, dtype=jnp.int32), K)
        shift = comm["edge_shift"].reshape(-1, 3)

        gml, gmr = comm["gml"], comm["gmr"]
        gpos = self._ghost_positions(
            pos, comm["send_l"], comm["ml"], comm["send_r"], comm["mr"],
            gml, gmr,
        )
        ext_pos = jnp.concatenate([pos, gpos], axis=0)
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
        ghost_spc = comm["ghost_species"]
        onehot_ext = jax.nn.one_hot(
            jnp.concatenate([comm["species"], ghost_spc]), spec.num_species,
            dtype=dtype,
        )

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
            gl, gr = self._exchange(
                x1, comm["send_l"], comm["ml"], comm["send_r"], comm["mr"]
            )
            x_ext = jnp.concatenate([x1, gl, gr], axis=0)
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

    def _comm_from_state(self, s_local):
        """Per-device comm dict from the (already sliced) local state."""
        gml, gmr = self._ghost_masks(
            s_local["send_left_mask"], s_local["send_right_mask"]
        )
        # ghost species travel with the (static-per-rebuild) send lists
        gsl, gsr = self._exchange(
            s_local["species"][:, None],
            s_local["send_left"], s_local["send_left_mask"],
            s_local["send_right"], s_local["send_right_mask"],
        )
        ghost_spc = jnp.concatenate([gsl[:, 0], gsr[:, 0]]).astype(jnp.int32)
        return {
            "atom_mask": s_local["atom_mask"],
            "species": s_local["species"],
            "ghost_species": ghost_spc,
            "send_l": s_local["send_left"],
            "ml": s_local["send_left_mask"],
            "send_r": s_local["send_right"],
            "mr": s_local["send_right_mask"],
            "gml": gml,
            "gmr": gmr,
            "edge_src": s_local["edge_src"],
            "edge_shift": s_local["edge_shift"],
            "edge_mask": s_local["edge_mask"],
        }

    # ------------------------------------------------------------------
    # jitted drivers
    # ------------------------------------------------------------------
    def _jit(self, kind, n_steps=0, dt=0.0, integrator="nve", **kw):
        key = (kind, n_steps, dt, integrator, tuple(sorted(kw.items())))
        if key in self._run_cache:
            return self._run_cache[key]

        from jax import shard_map

        state_fields = [
            "positions", "velocities", "forces", "species", "masses",
            "atom_mask", "send_left", "send_left_mask", "send_right",
            "send_right_mask", "edge_src", "edge_shift", "edge_mask",
            "nl_positions",
        ]

        def split(state):
            return {f: getattr(state, f) for f in state_fields}

        def local_of(stack):
            return jax.tree.map(lambda a: a[0], stack)

        def energy_forces(params, sl):
            comm = self._comm_from_state(sl)

            # Differentiate the LOCAL energy sum only: every device runs the
            # same reverse pass, and the ppermute transposes route each
            # device's ghost cotangents back to their owners — collectively
            # that is d(sum_d E_d)/d pos_local, the reference's reverse_comm
            # (pair_e3gnn_parallel.cpp:404-441). Do NOT psum before grad:
            # with check_vma=False the psum transpose would multiply the
            # (replicated) cotangent by D.
            def etot(p):
                with jax.default_matmul_precision(self.precision):
                    e = self._local_energy(
                        params, comm, p, jnp.zeros((3, 3), p.dtype)
                    )
                return jnp.sum(e)

            e_loc, g = jax.value_and_grad(etot)(sl["positions"])
            e = jax.lax.psum(e_loc, "dd")
            forces = -g * sl["atom_mask"][:, None].astype(g.dtype)
            return e, forces

        def rebuild(sl):
            (pos, vel, spc, mass, amask, send_l, ml, send_r, mr, src,
             shift, emask, ofl) = self._rebuild_local(
                None, sl["positions"], sl["velocities"], sl["species"],
                sl["masses"], sl["atom_mask"],
            )
            sl = dict(sl)
            sl.update(
                positions=pos, velocities=vel, species=spc, masses=mass,
                atom_mask=amask, send_left=send_l, send_left_mask=ml,
                send_right=send_r, send_right_mask=mr, edge_src=src,
                edge_shift=shift, edge_mask=emask, nl_positions=pos,
            )
            return sl, ofl

        def one_step(params, sl, ofl_acc):
            # skin trigger (global decision)
            disp = sl["positions"] - sl["nl_positions"]
            local_need = jnp.any(
                jnp.sum(disp * disp, -1)
                * sl["atom_mask"] > (self.skin / 2.0) ** 2
            )
            need = jax.lax.psum(local_need.astype(jnp.int32), "dd") > 0

            def do_rb(sl):
                sl2, ofl = rebuild(sl)
                return sl2, ofl

            sl, ofl = jax.lax.cond(
                need, do_rb, lambda s: (dict(s), jnp.asarray(False)), sl
            )
            ofl_acc = ofl_acc | jax.lax.psum(ofl.astype(jnp.int32), "dd") > 0

            # velocity Verlet
            acc = (
                sl["forces"] / sl["masses"][:, None] * EV_A_AMU_TO_A_FS2
                * sl["atom_mask"][:, None]
            )
            v_half = sl["velocities"] + 0.5 * dt * acc
            sl["positions"] = (
                sl["positions"] + dt * v_half * sl["atom_mask"][:, None]
            )
            e, forces = energy_forces(params, sl)
            acc2 = (
                forces / sl["masses"][:, None] * EV_A_AMU_TO_A_FS2
                * sl["atom_mask"][:, None]
            )
            sl["velocities"] = (
                v_half + 0.5 * dt * acc2
            ) * sl["atom_mask"][:, None]
            sl["forces"] = forces
            ke_loc = 0.5 * jnp.sum(
                sl["masses"][:, None] * sl["velocities"] ** 2
                * sl["atom_mask"][:, None]
            ) / EV_A_AMU_TO_A_FS2
            ke = jax.lax.psum(ke_loc, "dd")
            return sl, e, ke, ofl_acc

        if kind == "init":
            def body(params, stack):
                sl = local_of(stack)
                sl, ofl = rebuild(sl)
                e, forces = energy_forces(params, sl)
                sl["forces"] = forces
                out = jax.tree.map(lambda a: a[None], sl)
                return out, e[None], ofl[None]

            sm = shard_map(
                body, mesh=self.mesh,
                in_specs=(P(), P("dd")),
                out_specs=(P("dd"), P("dd"), P("dd")),
                check_vma=False,
            )

            def run(params, state):
                stack, e, ofl = sm(params, split(state))
                return state.replace(
                    potential_energy=e[0],
                    nl_overflow=state.nl_overflow | ofl.any(),
                    **{f: stack[f] for f in state_fields},
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
                    scan_body, (sl, jnp.asarray(False)), None, length=n_steps
                )
                out = jax.tree.map(lambda a: a[None], sl)
                return out, pe[None], ke[None], ofl[None]

            sm = shard_map(
                body, mesh=self.mesh,
                in_specs=(P(), P("dd")),
                out_specs=(P("dd"), P("dd"), P("dd"), P("dd")),
                check_vma=False,
            )

            def run(params, state):
                stack, pe, ke, ofl = sm(params, split(state))
                return (
                    state.replace(
                        potential_energy=pe[0, -1],
                        step=state.step + n_steps,
                        nl_overflow=state.nl_overflow | ofl.any(),
                        **{f: stack[f] for f in state_fields},
                    ),
                    (pe[0], ke[0]),
                )

            fn = jax.jit(run)
        else:
            raise ValueError(kind)
        self._run_cache[key] = fn
        return fn

    def run(self, state: DistMDState, n_steps: int, dt: float = 1.0,
            chunk: int = 10):
        """NVE for now; thermostats follow the serial engine's pattern."""
        pes, kes = [], []
        for length in [chunk] * (n_steps // chunk) + (
            [n_steps % chunk] if n_steps % chunk else []
        ):
            fn = self._jit("run", n_steps=length, dt=float(dt))
            state, (pe, ke) = fn(self.params, state)
            pes.append(pe)
            kes.append(ke)
        if bool(state.nl_overflow):
            raise RuntimeError(
                "distributed MD overflow: grow local/ghost/migrate capacities"
            )
        return state, (jnp.concatenate(pes), jnp.concatenate(kes))

    # convenience: gather owned atoms back to host (order not preserved)
    def gather_positions(self, state: DistMDState):
        pos = np.asarray(state.positions)
        msk = np.asarray(state.atom_mask)
        return pos[msk]
