"""Distributed (domain-decomposed) MD over a device mesh — the TPU-native
counterpart of the reference's parallel LAMMPS pair style
(``pair_e3gnn_parallel.cpp:194-506`` + the modified CommBrick halo exchange,
``comm_brick.cpp:1057-1123``), redesigned for SPMD:

- 1-D slab or 2-D/3-D **brick** decomposition over a 1-3-axis mesh; bricks
  are slabs in FRACTIONAL coordinates, so triclinic cells decompose into
  prisms (the CommBrick prism handling analogue,
  ``comm_brick.cpp:1057-1123``); each device owns the atoms in its brick
  (fixed capacity + mask).
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

from ..md.integrators import _nhc_baro_half, _sinhc
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
    # optional D3 dispersion NL (second, longer-ranged; src indexes the
    # extended set like the model NL)
    d3_edge_src: Optional[jnp.ndarray] = None    # (D, NL, K3)
    d3_edge_shift: Optional[jnp.ndarray] = None  # (D, NL, K3, 3)
    d3_edge_mask: Optional[jnp.ndarray] = None   # (D, NL, K3)
    # MTK NPT barostat (replicated): [v_eps, xi(3), vxi(3), eps_log],
    # isotropic cell scale s (physical cell = s * cell0), and the virial
    # pressure from the last force evaluation (needed by the next
    # half-step's piston update)
    baro: Optional[jnp.ndarray] = None        # (D, 8)
    cell_scale: Optional[jnp.ndarray] = None  # (D,)
    p_virial: Optional[jnp.ndarray] = None    # (D,)


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

    Cells may be triclinic (fractional-space prism bricks). ``axes`` maps
    mesh axes (in ``mesh.axis_names`` order) to cell axes; by default the
    cell axes with the largest perpendicular plane spacings are used. For
    a 1-D mesh the legacy ``axis`` argument is honored. Optional ``d3``
    enables Grimme D3 dispersion under decomposition (a second local NL;
    ghost coordination numbers ride the halo exchange), and
    ``integrator="npt"`` in :meth:`run` drives an isotropic MTK barostat
    (pass ``scale_budget`` < 1 to pre-size halos/grids for the smallest
    cell scale the run may reach).
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
        d3: Optional[dict] = None,
        scale_budget: float = 1.0,
    ):
        cell = np.asarray(cell, np.float64).reshape(3, 3)
        # NPT headroom: the smallest isotropic cell scale s the run may
        # reach (physical cell = s * cell0). Halo bands, brick-width
        # asserts, and the local cell-list grid are sized for s_min so the
        # static decomposition stays valid while the MTK piston breathes;
        # the rebuild flags overflow if s ever drops below it. Pass e.g.
        # 0.9 when running ``integrator="npt"``.
        self.s_min = float(min(scale_budget, 1.0))
        assert self.s_min > 0.5, "scale_budget must be in (0.5, 1]"
        # per-device memory policy: the force backward over the extended
        # (owned+ghost) set must not materialize (E_local, dim_mid)
        # per-edge tensors for every layer — rematerialize layers and
        # keep/raise an edge-chunk bound (a mesh-1 run at 10k atoms
        # measured 16.4 GB HBM without this; specs with their own chunk
        # keep it)
        self.spec = dataclasses.replace(
            spec,
            edge_dense_k=0,
            conv_fused=False,
            remat_layers=True,
            edge_chunk=spec.edge_chunk or 32768,
        )
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
        # optional D3 dispersion under decomposition (the reference runs
        # pair d3 alongside the parallel pair style, pair_d3.cu under
        # LAMMPS domain decomposition): a second, longer-ranged local NL;
        # the ghost halo must widen to the D3 cutoff and coordination
        # numbers of ghosts ship over the halo exchange
        self.d3_params = None
        if d3:
            from ..d3 import D3Params, bounded_cutoff

            p = D3Params.from_functional(
                d3.get("functional", "pbe"),
                d3.get("damping", d3.get("damping_type", "damp_bj")),
            )
            cut = d3.get("cutoff") or bounded_cutoff(p, cell, True)
            inv0 = np.linalg.inv(cell)
            heights0 = 1.0 / np.linalg.norm(inv0, axis=0)
            cut = min(cut, float(heights0.min()) - self.skin - 1e-6)
            import dataclasses as _dc

            self.d3_params = _dc.replace(
                p, cutoff=cut, cn_cutoff=min(p.cn_cutoff, cut)
            )
        self.rc_ghost = self.rc
        if self.d3_params is not None:
            self.rc_ghost = max(
                self.rc, float(self.d3_params.cutoff) + self.skin
            )
            z2t = np.asarray(spec.z_to_type)
            t2z = np.zeros(spec.num_species, np.int32)
            for z, t in enumerate(z2t):
                if t >= 0:
                    t2z[int(t)] = z
            self.t2z = t2z
        # fractional-space brick geometry (triclinic-ready, the CommBrick
        # prism handling analogue, comm_brick.cpp:1057-1123): bricks are
        # slabs in FRACTIONAL coordinate u_a; halo band widths convert the
        # real-space cutoff through the perpendicular plane spacing h_a
        inv_full = np.linalg.inv(cell)
        heights_all = 1.0 / np.linalg.norm(inv_full, axis=0)  # per cell axis
        if axes is None:
            if axis is not None and self.n_stages == 1:
                axes = (int(axis),)
            else:
                axes = tuple(
                    int(i) for i in np.argsort(-heights_all)[: self.n_stages]
                )
        self.axes: Tuple[int, ...] = tuple(int(a) for a in axes)
        assert len(self.axes) == self.n_stages
        assert len(set(self.axes)) == self.n_stages
        self.inv_cols = tuple(
            np.asarray(inv_full[:, a], np.float64) for a in self.axes
        )  # grad of u_a wrt position
        self.h = tuple(float(heights_all[a]) for a in self.axes)
        # D3 cutoff must also fit the brick: ghosts only come from face
        # neighbors, so the halo cannot exceed one brick width
        if self.d3_params is not None:
            wmin = min(
                (self.h[s] / self.dims[s]
                 for s in range(self.n_stages) if self.dims[s] > 1),
                default=np.inf,
            )
            cut = float(self.d3_params.cutoff)
            if cut + self.skin > wmin:
                import dataclasses as _dc

                cut = wmin - self.skin - 1e-6
                assert cut > 2.0, (
                    "brick too thin for any useful D3 cutoff"
                )
                self.d3_params = _dc.replace(
                    self.d3_params, cutoff=cut,
                    cn_cutoff=min(self.d3_params.cn_cutoff, cut),
                )
            self.rc_ghost = max(self.rc, float(self.d3_params.cutoff) + self.skin)
        self.u_w = tuple(1.0 / self.dims[s] for s in range(self.n_stages))
        # halo band width: the widest cutoff any physics needs (model or
        # D3), at the smallest cell scale the NPT budget allows (fractional
        # widths GROW as the cell shrinks)
        self.u_rc = tuple(
            self.rc_ghost / (self.h[s] * self.s_min)
            for s in range(self.n_stages)
        )
        self.w = tuple(
            self.h[s] / self.dims[s] for s in range(self.n_stages)
        )  # real perpendicular brick width (at s=1)
        for s in range(self.n_stages):
            assert (
                self.w[s] * self.s_min >= self.rc_ghost
                or self.dims[s] == 1
            ), (
                f"brick width {self.w[s] * self.s_min:.2f} (at the NPT "
                f"scale budget) along cell axis {self.axes[s]}"
                f" < halo width {self.rc_ghost:.2f}: use fewer devices, a "
                "bigger box, or a smaller d3 cutoff"
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
                        lo = dc[t] * self.u_w[t] - self.u_rc[t]
                        hi = (dc[t] + 1) * self.u_w[t] + self.u_rc[t]
                        u = frac[:, self.axes[t]]
                        inside = (
                            ((u - lo) % 1.0 <= (hi - lo))
                            if self.dims[t] > 1 else np.ones(n, bool)
                        )
                        sel &= inside
                    if self.dims[s] == 1:
                        cnt = 0
                    else:
                        u = frac[sel][:, a]
                        lo_face = dc[s] * self.u_w[s]
                        hi_face = (dc[s] + 1) * self.u_w[s]
                        near_lo = (lo_face - u) % 1.0 <= self.u_rc[s]
                        near_hi = (u - hi_face) % 1.0 <= self.u_rc[s]
                        cnt = max(int(near_lo.sum()), int(near_hi.sum()))
                    best = max(best, cnt)
                self.ghost_caps.append(
                    int(-(-int(best * 1.6 + 8) // 8) * 8)
                )
        if self.migrate_cap is None:
            self.migrate_cap = max(max(self.ghost_caps) // 2, 16)

        if self.cl_spec is None:
            # local frame cell: brick + two halos + decoupling gap along
            # every decomposed axis with >1 device. Triclinic-safe: the
            # whole ROW (lattice vector) is scaled, so the local frame
            # keeps the cell's shape (prism bricks, comm_brick.cpp prism
            # handling analogue)
            fake = self.cell.copy()
            # occupied-volume fraction of the fake cell: atoms live only in
            # the brick + two halo bands — the decoupling gap is EMPTY, so
            # the spec's uniform-density estimate would undersize the
            # per-bin capacity (measured overflow with the wider D3 halo)
            occ = 1.0
            for s, a in enumerate(self.axes):
                if self.dims[s] > 1:
                    f_a = self.u_w[s] + (2 + 2.2) * self.u_rc[s]
                    fake[a] = self.cell[a] * f_a
                    occ *= (self.u_w[s] + 2 * self.u_rc[s]) / f_a
            next_cap = NL + 2 * sum(self.ghost_caps)
            n_eff = int(np.ceil(next_cap / occ))
            # grid sized at the NPT budget's smallest cell (s_min): bin
            # edges stay >= cutoff for every allowed scale, and the
            # higher density oversizes per-bin capacity conservatively
            self.cl_spec = build_cell_list_spec(
                fake * self.s_min, n_eff, self.spec.cutoff, self.skin
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
            if self.d3_params is not None:
                d3spec = build_cell_list_spec(
                    fake * self.s_min, n_eff,
                    float(self.d3_params.cutoff), self.skin,
                )
                self.d3_cl_spec = dataclasses.replace(d3spec, edge_cap=0)
            else:
                self.d3_cl_spec = None

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
        d3_fields = {}
        if self.d3_params is not None:
            K3 = self.d3_cl_spec.neighbor_capacity
            d3_fields = dict(
                d3_edge_src=jnp.zeros((D, A, K3), jnp.int32),
                d3_edge_shift=jnp.zeros((D, A, K3, 3), jnp.float32),
                d3_edge_mask=jnp.zeros((D, A, K3), bool),
            )
        state = DistMDState(
            **d3_fields,
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
            baro=jnp.zeros((D, 8), jnp.float32),
            cell_scale=jnp.ones((D,), jnp.float32),
            p_virial=jnp.zeros((D,), jnp.float32),
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

    def _staged_ext(self, arr_owned, comm, correct_axis_pos=False,
                    scale=1.0):
        """Extend a per-atom array with all ghost stages:
        [owned | g0lo | g0hi | g1lo | g1hi | ...]. With
        ``correct_axis_pos`` the stage-s axis coordinate gets the periodic
        seam correction (positions only; ``scale`` is the instantaneous
        NPT cell scale)."""
        ext = arr_owned
        dtype = arr_owned.dtype
        for s in range(self.n_stages):
            from_lo, from_hi = self._exchange_stage(
                s, ext, comm["send_lo"][s], comm["mlo"][s],
                comm["send_hi"][s], comm["mhi"][s],
            )
            if correct_axis_pos and self.dims[s] > 1:
                # periodic seam: ghosts crossing the cell boundary shift by
                # the full lattice VECTOR of the decomposed axis (triclinic)
                d = jax.lax.axis_index(self.axis_names[s])
                row = jnp.asarray(self.cell[self.axes[s]], dtype) * scale
                corr_lo = jnp.where(d == 0, -1.0, 0.0)
                corr_hi = jnp.where(d == self.dims[s] - 1, 1.0, 0.0)
                from_lo = from_lo + row[None, :] * (
                    corr_lo * comm["gmlo"][s].astype(dtype)
                )[:, None]
                from_hi = from_hi + row[None, :] * (
                    corr_hi * comm["gmhi"][s].astype(dtype)
                )[:, None]
            ext = jnp.concatenate([ext, from_lo, from_hi], axis=0)
        return ext

    def _to_local_frame(self, pos, scale=1.0):
        """Shift into the device's local (fake-cell) frame: subtract
        (origin_u - u_rc) lattice vectors along each decomposed axis."""
        out = pos
        for s, a in enumerate(self.axes):
            if self.dims[s] > 1:
                d = jax.lax.axis_index(self.axis_names[s])
                off_u = d.astype(pos.dtype) * jnp.asarray(
                    self.u_w[s], pos.dtype
                ) - jnp.asarray(self.u_rc[s], pos.dtype)
                row = jnp.asarray(self.cell[a], pos.dtype) * scale
                out = out - off_u * row[None, :]
        return out

    # ------------------------------------------------------------------
    def _migrate_axis(self, s, pos, vel, spc, mass, amask, scale=1.0):
        """One axis pass of migration; returns updated arrays + overflow."""
        dtype = pos.dtype
        NL = pos.shape[0]
        a = self.axes[s]
        Dv = self.dims[s]
        d = jax.lax.axis_index(self.axis_names[s])
        u = pos @ jnp.asarray(self.inv_cols[s], dtype) / scale
        own = jnp.clip((u * Dv).astype(jnp.int32), 0, Dv - 1)
        rel = own - d
        stay = (rel == 0) & amask
        if Dv == 1:
            # degenerate axis: the device owns the whole extent — nothing
            # migrates (rel == Dv-1 == 0 would otherwise mark EVERY
            # staying atom as lo-bound and overflow the migrate buffer)
            go_lo = jnp.zeros_like(stay)
            go_hi = jnp.zeros_like(stay)
        elif Dv == 2:
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
        scale = sl["cell_scale"].astype(dtype)

        # ---- wrap (fractional coords are scale-invariant) ----
        inv = jnp.asarray(np.linalg.inv(self.cell), dtype)
        frac = pos @ inv / scale
        frac = frac - jnp.floor(frac)
        pos = frac @ jnp.asarray(self.cell, dtype) * scale

        # ---- migration: one pass per decomposed axis (diagonal moves
        # complete across the sequential passes) ----
        # the static band widths/grid were sized for scale >= s_min
        ofl = scale < jnp.asarray(self.s_min, dtype)
        for s in range(self.n_stages):
            pos, vel, spc, mass, amask, o = self._migrate_axis(
                s, pos, vel, spc, mass, amask, scale
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
            u_w = jnp.asarray(self.u_w[s], dtype)
            u_rc = jnp.asarray(self.u_rc[s], dtype)
            origin = d.astype(dtype) * u_w
            u = ext_pos @ jnp.asarray(self.inv_cols[s], dtype) / scale
            cap = self.ghost_caps[s]
            if self.dims[s] > 1:
                band_lo = ext_mask & (u < origin + u_rc)
                band_hi = ext_mask & (u >= origin + u_w - u_rc)
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
                row = jnp.asarray(self.cell[a], dtype) * scale
                corr_lo = jnp.where(d == 0, -1.0, 0.0)
                corr_hi = jnp.where(d == self.dims[s] - 1, 1.0, 0.0)
                from_lo = from_lo + row[None, :] * (
                    corr_lo * gl.astype(dtype)
                )[:, None]
                from_hi = from_hi + row[None, :] * (
                    corr_hi * gh.astype(dtype)
                )[:, None]
            ext_pos = jnp.concatenate([ext_pos, from_lo, from_hi], axis=0)
            ext_mask = jnp.concatenate([ext_mask, gl, gh], axis=0)

        # ---- local NL over the extended set ----
        loc = self._to_local_frame(ext_pos, scale)
        src, dst, shift, emask, ofl_nl, _ = rebuild_neighbors(
            self.cl_spec, loc,
            jnp.asarray(self.fake_cell, dtype) * scale, ext_mask,
        )
        K = self.cl_spec.neighbor_capacity
        Next = ext_pos.shape[0]
        src = src.reshape(Next, K)[:NL]
        shift = shift.reshape(Next, K, 3)[:NL]
        emask = emask.reshape(Next, K)[:NL]

        def gap_check(shift_a, emask_a):
            # any owned edge wrapping a decomposed axis: the gap failed
            g = jnp.asarray(False)
            for s, a in enumerate(self.axes):
                if self.dims[s] > 1:
                    g = g | jnp.any(
                        (jnp.abs(shift_a[..., a]) > 0.5) & emask_a
                    )
            return g

        ofl_gap = gap_check(shift, emask)

        sl = dict(sl)
        if self.d3_params is not None:
            s3, _, sh3, m3, ofl3, _ = rebuild_neighbors(
                self.d3_cl_spec, loc,
                jnp.asarray(self.fake_cell, dtype) * scale, ext_mask,
            )
            K3 = self.d3_cl_spec.neighbor_capacity
            s3 = s3.reshape(Next, K3)[:NL]
            sh3 = sh3.reshape(Next, K3, 3)[:NL]
            m3 = m3.reshape(Next, K3)[:NL]
            ofl_gap = ofl_gap | gap_check(sh3, m3)
            ofl_nl = ofl_nl | ofl3
            sl.update(d3_edge_src=s3, d3_edge_shift=sh3, d3_edge_mask=m3)
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
        comm = {
            "atom_mask": sl["atom_mask"],
            "species": sl["species"],
            "cell_scale": sl["cell_scale"],
            "send_lo": sl["send_lo"], "mlo": sl["mlo"],
            "send_hi": sl["send_hi"], "mhi": sl["mhi"],
            "gmlo": tuple(gmlo), "gmhi": tuple(gmhi),
            "edge_src": sl["edge_src"],
            "edge_shift": sl["edge_shift"],
            "edge_mask": sl["edge_mask"],
        }
        if self.d3_params is not None:
            comm.update(
                d3_edge_src=sl["d3_edge_src"],
                d3_edge_shift=sl["d3_edge_shift"],
                d3_edge_mask=sl["d3_edge_mask"],
            )
        return comm

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

        scale = comm["cell_scale"].astype(dtype)
        ext_pos = self._staged_ext(
            pos, comm, correct_axis_pos=True, scale=scale
        )
        cell = jnp.asarray(self.cell, dtype) * scale
        ev = ext_pos[src] - pos[dst] + shift @ cell
        ev = ev + ev @ eps
        ev = jnp.where(
            emask[:, None], ev,
            jnp.array([2.0 * spec.cutoff, 0.0, 0.0], dtype),
        )

        from ..model.model import _vec_mode

        vec_fused = self.fused and _vec_mode(
            dataclasses.replace(spec, conv_ring=False)
            if spec.conv_ring else spec
        )
        if vec_fused:
            vec_rows = ev.T  # (3, NL*K) row-major
            coef_col = params["edge_embedding"]["bessel_coeffs"][:, None]
            edge_emb = sh = None
        else:
            r = jnp.linalg.norm(ev, axis=-1)
            basis = bessel_basis(
                r, params["edge_embedding"]["bessel_coeffs"], spec.cutoff
            )
            env = _cutoff_envelope(spec, r)
            edge_emb = basis * (env * emask.astype(dtype))[:, None]
            sh = spherical_harmonics(
                spec.lmax_edge, ev, normalize=spec.normalize_sph
            )

        onehot = jax.nn.one_hot(comm["species"], spec.num_species, dtype=dtype)

        x = linear_apply(
            spec.embed_linear, params["onehot_to_feature_x"], onehot
        )
        def layer_step(x, params, layer, t):
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
            from ..ops.fused_conv import chunk_threshold

            # stream row chunks when the gathered per-edge tensor is too
            # large to materialize per layer (same policy as model.py)
            rc_ext = (
                (spec.edge_chunk // K)
                if spec.edge_chunk
                and NL * K * layer.conv.irreps_x.dim * 4 > chunk_threshold()
                else 0
            )
            if vec_fused:
                from ..ops.fused_conv import fused_conv_apply_ext_vec
                from ..model.model import _edge_embed_spec

                xc = fused_conv_apply_ext_vec(
                    layer.conv, layer.radial_mlp,
                    params[f"{t}_convolution"]["weight_nn"],
                    coef_col,
                    _edge_embed_spec(spec, layer),
                    x_ext,
                    vec_rows,
                    comm["edge_src"],
                    param_grads=False,
                    row_chunk=rc_ext,
                )
            elif self.fused:
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
                    row_chunk=rc_ext,
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
            return gate_apply(layer.gate, xc)

        if spec.remat_layers:
            # the force backward otherwise holds every layer's gathered
            # per-edge tensors (~16 GB/device at 10k atoms, measured
            # OOM); recomputing a layer re-issues its halo ppermutes —
            # the standard remat/comm tradeoff
            layer_step = jax.checkpoint(layer_step, static_argnums=(2, 3))
        for layer in spec.layers:
            x = layer_step(x, params, layer, layer.t)

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
        e_at = (e_scaled * scale_v + shift_v) * amask
        if self.d3_params is not None:
            e_at = e_at + self._d3_local_energy(comm, pos, ext_pos, eps)
        return e_at

    def _d3_local_energy(self, comm, pos, ext_pos, eps):
        """D3 dispersion energy attributed to owned receivers.

        The reference runs ``pair d3`` alongside the parallel pair style
        under LAMMPS domain decomposition (``pair_d3.cu``), getting ghost
        coordination numbers from LAMMPS ghost communication. Here: CN is
        computed exactly for OWNED atoms over the (NL, K3) local D3
        neighbor list (complete, since the halo spans the D3 cutoff), then
        ghost CN values ride the staged ppermute halo; the pair energies
        carry the 1/2 double-count factor so summing owned receivers over
        all devices is exact. Fully differentiable — the CN exchange's
        ppermute transpose routes the dC6/dCN force contribution back to
        the ghost owners (``kernel_get_dC6_dCNij``, ``pair_d3.cu:796``).
        """
        from .. import d3 as d3mod

        p3 = self.d3_params
        dtype = pos.dtype
        NL = pos.shape[0]
        K3 = self.d3_cl_spec.neighbor_capacity
        src3 = comm["d3_edge_src"].reshape(-1)
        dst3 = jnp.repeat(jnp.arange(NL, dtype=jnp.int32), K3)
        m3 = comm["d3_edge_mask"].reshape(-1)
        sh3 = comm["d3_edge_shift"].reshape(-1, 3)
        cell = jnp.asarray(self.cell, dtype) * comm["cell_scale"].astype(dtype)
        ev = ext_pos[src3] - pos[dst3] + sh3 @ cell
        ev = ev + ev @ eps
        em = m3.astype(dtype)
        r_ang = jnp.linalg.norm(
            jnp.where(m3[:, None], ev, jnp.array([1.0, 0.0, 0.0], dtype)),
            axis=-1,
        )
        z_own = jnp.asarray(self.t2z)[comm["species"]]  # (NL,) atomic numbers
        z_own = jnp.where(comm["atom_mask"], z_own, 0)
        z_ext = self._staged_ext(z_own[:, None].astype(dtype), comm)[:, 0]
        zi = jnp.clip(z_own, 0, 94)[dst3]
        zj = jnp.clip(z_ext.astype(jnp.int32), 0, 94)[src3]
        cn_own = d3mod.d3_cn(p3, zi, zj, r_ang, em, dst3, NL)
        cn_ext = self._staged_ext(cn_own[:, None], comm)[:, 0]
        e_pair = d3mod.d3_pair_energy(
            p3, zi, zj, r_ang, em, cn_own[dst3], cn_ext[src3]
        )
        e_at = jax.ops.segment_sum(
            e_pair, dst3, num_segments=NL, indices_are_sorted=True
        )
        return e_at * d3mod.AU_TO_EV * comm["atom_mask"].astype(dtype)

    # ------------------------------------------------------------------
    # jitted drivers
    # ------------------------------------------------------------------
    def _state_fields(self):
        base = [
            "positions", "velocities", "forces", "species", "masses",
            "atom_mask", "send_lo", "mlo", "send_hi", "mhi",
            "edge_src", "edge_shift", "edge_mask", "nl_positions",
            "rng", "thermo", "baro", "cell_scale", "p_virial",
        ]
        if self.d3_params is not None:
            base += ["d3_edge_src", "d3_edge_shift", "d3_edge_mask"]
        return base

    def _split(self, state: DistMDState):
        out = {
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
            "baro": state.baro,
            "cell_scale": state.cell_scale,
            "p_virial": state.p_virial,
        }
        if self.d3_params is not None:
            out.update(
                d3_edge_src=state.d3_edge_src,
                d3_edge_shift=state.d3_edge_shift,
                d3_edge_mask=state.d3_edge_mask,
            )
        return out

    def _merge(self, state: DistMDState, stack) -> DistMDState:
        upd = dict(
            positions=stack["positions"], velocities=stack["velocities"],
            forces=stack["forces"], species=stack["species"],
            masses=stack["masses"], atom_mask=stack["atom_mask"],
            send_lo=stack["send_lo"], send_lo_mask=stack["mlo"],
            send_hi=stack["send_hi"], send_hi_mask=stack["mhi"],
            edge_src=stack["edge_src"], edge_shift=stack["edge_shift"],
            edge_mask=stack["edge_mask"], nl_positions=stack["nl_positions"],
            rng=stack["rng"], thermo=stack["thermo"],
            baro=stack["baro"], cell_scale=stack["cell_scale"],
            p_virial=stack["p_virial"],
        )
        if self.d3_params is not None:
            upd.update(
                d3_edge_src=stack["d3_edge_src"],
                d3_edge_shift=stack["d3_edge_shift"],
                d3_edge_mask=stack["d3_edge_mask"],
            )
        return state.replace(**upd)

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

        det0 = float(abs(np.linalg.det(self.cell)))

        def energy_forces_virial(params, sl):
            """Like ``energy_forces`` but also differentiates a symmetric
            strain probe to get the global virial pressure (needed every
            step by the MTK piston; the eps gradient is purely local —
            edge vectors are domain-local — so a psum sums per-device
            virials exactly, like the reference's per-rank LAMMPS virial
            tallies, ``pair_e3gnn_parallel.cpp:482-506``)."""
            comm = self._comm_from_state(sl)

            def etot(p, eps):
                with jax.default_matmul_precision(self.precision):
                    e = self._local_energy(params, comm, p, eps)
                return jnp.sum(e)

            eps0 = jnp.zeros((3, 3), sl["positions"].dtype)
            e_loc, (gp, geps) = jax.value_and_grad(etot, argnums=(0, 1))(
                sl["positions"], eps0
            )
            e = self._psum_all(e_loc)
            geps = self._psum_all(geps)
            forces = -gp * sl["atom_mask"][:, None].astype(gp.dtype)
            vol = det0 * sl["cell_scale"].astype(gp.dtype) ** 3
            # model convention: P_virial = +trace(stress)/3 with
            # stress = -geps/vol (see md/state.MDState.pressure)
            p_vir = -(geps[0, 0] + geps[1, 1] + geps[2, 2]) / (3.0 * vol)
            return e, forces, p_vir

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

            if integrator in ("npt", "npt_mtk", "npt_nose_hoover"):
                # MTK isotropic NPT with a REPLICATED barostat: every
                # device runs the same piston/chain math on psum'd global
                # KE and virial pressure, so the (8,) baro vector and the
                # scalar cell scale stay bitwise identical across the mesh
                # (the distributed analogue of LAMMPS `fix npt` driving
                # the parallel pair style; serial twin: mtk_npt_step,
                # md/integrators.py)
                temperature = kw["temperature"]
                pressure = kw.get("pressure", 0.0)
                tau_t = kw.get("tau_t", 100.0)
                tau_p = kw.get("tau_p", 1000.0)
                kT = KB_EV * temperature
                W = (ndof + 3.0) * kT * tau_p * tau_p
                alpha = 1.0 + 3.0 / ndof
                dt2, dt4 = dt / 2.0, dt / 4.0

                def veps_half(v, baro, p_vir, s):
                    ke2 = 2.0 * global_ke(v)
                    vol = det0 * s ** 3
                    p_int = p_vir + ke2 / (3.0 * vol)
                    G = (
                        3.0 * vol * (p_int - pressure)
                        + (3.0 / ndof) * ke2
                    ) / W
                    return baro.at[0].add(dt2 * G)

                def kick(v, baro, forces):
                    vf = jnp.exp(-dt2 * alpha * baro[0])
                    sf = jnp.exp(-dt4 * alpha * baro[0]) * _sinhc(
                        dt4 * alpha * baro[0]
                    )
                    a = (
                        forces / sl["masses"][:, None]
                        * EV_A_AMU_TO_A_FS2 * mask
                    )
                    return (v * vf + dt2 * a * sf) * mask

                baro = _nhc_baro_half(sl["baro"], dt, temperature, tau_p, W)
                v, thermo = _nhc_half_global(
                    sl["velocities"], sl["thermo"], dt, temperature, tau_t,
                    ndof, global_ke,
                )
                sl["thermo"] = thermo
                baro = veps_half(v, baro, sl["p_virial"], sl["cell_scale"])
                v = kick(v, baro, sl["forces"])

                # full-step position/cell drift under the piston
                v_eps = baro[0]
                ef = jnp.exp(dt * v_eps)
                rf = jnp.exp(dt2 * v_eps) * _sinhc(dt2 * v_eps)
                x = sl["positions"] * ef + dt * v * rf
                sl["positions"] = jnp.where(mask, x, sl["positions"])
                sl["nl_positions"] = sl["nl_positions"] * ef
                sl["cell_scale"] = sl["cell_scale"] * ef
                baro = baro.at[7].add(dt * v_eps)

                e, forces, p_vir = energy_forces_virial(params, sl)
                sl["forces"] = forces
                sl["p_virial"] = p_vir

                v = kick(v, baro, forces)
                baro = veps_half(v, baro, p_vir, sl["cell_scale"])
                v, thermo = _nhc_half_global(
                    v, sl["thermo"], dt, temperature, tau_t, ndof, global_ke
                )
                sl["velocities"] = v
                sl["thermo"] = thermo
                sl["baro"] = _nhc_baro_half(baro, dt, temperature, tau_p, W)
            elif integrator == "langevin":
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
                e, forces, p_vir = energy_forces_virial(params, sl)
                sl["forces"] = forces
                sl["p_virial"] = p_vir
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
        nose_hoover/nvt | npt (pass ``temperature``, optional ``friction``
        / ``tau`` / ``pressure`` / ``tau_t`` / ``tau_p``); the Nose-Hoover
        chain thermostats the GLOBAL kinetic energy, Langevin uses
        independent per-device noise streams, and npt runs the isotropic
        MTK barostat with a replicated piston on psum'd KE/virial
        (construct the engine with ``scale_budget`` < 1 to budget halo
        geometry for cell shrinkage)."""
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
