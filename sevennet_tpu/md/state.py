"""MD state pytree and physical constants.

Units follow the ASE convention used throughout the reference: length in
Angstrom, energy in eV, mass in amu, time in femtoseconds. The acceleration
conversion constant is ``1 eV/Angstrom/amu = 9.64853e-3 Angstrom/fs^2``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = ["MDState", "ATOMIC_MASSES", "init_md_state", "EV_A_AMU_TO_A_FS2", "KB_EV"]

EV_A_AMU_TO_A_FS2 = 9.648533212e-3  # (eV/A/amu) -> A/fs^2
KB_EV = 8.617333262e-5  # Boltzmann, eV/K

# standard atomic weights, index = atomic number (0 unused); unstable
# elements use their most common isotope mass
ATOMIC_MASSES = np.array([
    0.0, 1.008, 4.0026, 6.94, 9.0122, 10.81, 12.011, 14.007, 15.999, 18.998,
    20.180, 22.990, 24.305, 26.982, 28.085, 30.974, 32.06, 35.45, 39.948,
    39.098, 40.078, 44.956, 47.867, 50.942, 51.996, 54.938, 55.845, 58.933,
    58.693, 63.546, 65.38, 69.723, 72.630, 74.922, 78.971, 79.904, 83.798,
    85.468, 87.62, 88.906, 91.224, 92.906, 95.95, 97.0, 101.07, 102.91,
    106.42, 107.87, 112.41, 114.82, 118.71, 121.76, 127.60, 126.90, 131.29,
    132.91, 137.33, 138.91, 140.12, 140.91, 144.24, 145.0, 150.36, 151.96,
    157.25, 158.93, 162.50, 164.93, 167.26, 168.93, 173.05, 174.97, 178.49,
    180.95, 183.84, 186.21, 190.23, 192.22, 195.08, 196.97, 200.59, 204.38,
    207.2, 208.98, 209.0, 210.0, 222.0, 223.0, 226.0, 227.0, 232.04, 231.04,
    238.03, 237.0, 244.0, 243.0, 247.0, 247.0, 251.0, 252.0, 257.0, 258.0,
    259.0, 262.0, 267.0, 270.0, 269.0, 270.0, 270.0, 278.0, 281.0, 281.0,
    285.0, 286.0, 289.0, 289.0, 293.0, 293.0, 294.0,
])


@struct.dataclass
class MDState:
    positions: jnp.ndarray  # (N, 3) A
    velocities: jnp.ndarray  # (N, 3) A/fs
    forces: jnp.ndarray  # (N, 3) eV/A
    species: jnp.ndarray  # (N,) int32 model type indices
    masses: jnp.ndarray  # (N,) amu
    cell: jnp.ndarray  # (3, 3)
    atom_mask: jnp.ndarray  # (N,) bool
    rng: jnp.ndarray  # PRNG key
    step: jnp.ndarray  # () int32
    # neighbor bookkeeping
    nl_positions: jnp.ndarray  # (N, 3) positions at last rebuild
    edge_src: jnp.ndarray  # (E,) int32
    edge_dst: jnp.ndarray  # (E,) int32
    edge_shift: jnp.ndarray  # (E, 3)
    edge_mask: jnp.ndarray  # (E,) bool
    nl_overflow: jnp.ndarray  # () bool - neighbor capacity exceeded
    potential_energy: jnp.ndarray  # ()
    stress: jnp.ndarray  # (6,) voigt eV/A^3 (zeros unless engine computes it)
    thermo: jnp.ndarray  # (2, 3) Nose-Hoover chain (xi, v_xi) per link
    # MTK barostat DOF: [v_eps, xi_b1..3, vxi_b1..3, eps] (zeros when unused)
    baro: Optional[jnp.ndarray] = None  # (8,)
    edge_mir: Optional[jnp.ndarray] = None  # (E,) mirror map (fused conv)
    # ring-backward window violated (grow the row chunk, not the NL)
    ring_overflow: Optional[jnp.ndarray] = None  # () bool
    # original input index of each slot (tracks identity under spatial
    # sorting; trajectory dumps unpermute with it)
    atom_index: Optional[jnp.ndarray] = None  # (N,) int32
    # optional D3 dispersion term (second, longer-ranged neighbor list)
    z_numbers: Optional[jnp.ndarray] = None  # (N,) int32 atomic numbers
    d3_edge_src: Optional[jnp.ndarray] = None  # (E3,) int32
    d3_edge_dst: Optional[jnp.ndarray] = None  # (E3,) int32
    d3_edge_shift: Optional[jnp.ndarray] = None  # (E3, 3)
    d3_edge_mask: Optional[jnp.ndarray] = None  # (E3,) bool

    @property
    def n_atoms_cap(self):
        return self.positions.shape[0]

    def kinetic_energy(self):
        ke = 0.5 * jnp.sum(
            self.masses[:, None] * self.velocities**2 * self.atom_mask[:, None]
        )
        return ke / EV_A_AMU_TO_A_FS2  # amu*(A/fs)^2 -> eV

    def temperature(self):
        ndof = 3 * jnp.maximum(jnp.sum(self.atom_mask), 1)
        return 2.0 * self.kinetic_energy() / (ndof * KB_EV)

    def volume(self):
        return jnp.abs(jnp.linalg.det(self.cell))

    def pressure(self):
        """Total pressure (eV/A^3): virial + kinetic ideal-gas term.
        Requires the engine to have filled ``stress``. The model's internal
        stress convention has P = +trace/3 (= -dE/dV, FD-validated in
        test_md.py); the ASE-facing calculator flips the sign."""
        p_virial = (self.stress[0] + self.stress[1] + self.stress[2]) / 3.0
        p_kin = 2.0 * self.kinetic_energy() / (3.0 * self.volume())
        return p_virial + p_kin


def init_md_state(
    positions,
    species,
    cell,
    atomic_numbers=None,
    masses=None,
    velocities=None,
    temperature: Optional[float] = None,
    seed: int = 0,
    n_atoms_cap: Optional[int] = None,
    n_edges_cap: int = 0,
    dtype=jnp.float32,
    with_mirror: bool = False,
    d3_edges_cap: int = 0,
) -> MDState:
    import jax

    n = len(positions)
    cap = n_atoms_cap or n
    if masses is None:
        assert atomic_numbers is not None, "need atomic_numbers or masses"
        masses = ATOMIC_MASSES[np.asarray(atomic_numbers)]
    pad = lambda a, fill=0: np.concatenate(
        [np.asarray(a), np.full((cap - len(a),) + np.shape(a)[1:], fill, np.asarray(a).dtype)]
    ) if cap > len(a) else np.asarray(a)

    if velocities is None:
        if temperature is None:
            velocities = np.zeros((n, 3))
        else:
            # host numpy PRNG: the jax.random draw ran on the default
            # device, and fetching the (N, 3) result back through the
            # axon tunnel blocked for minutes at 100k atoms (round 5)
            rng_np = np.random.default_rng(seed)
            sigma = np.sqrt(KB_EV * temperature / masses) * np.sqrt(EV_A_AMU_TO_A_FS2)
            velocities = rng_np.normal(size=(n, 3)) * sigma[:, None]
            # remove COM drift
            p = (masses[:, None] * velocities).sum(0)
            velocities = velocities - p / masses.sum()

    mask = np.zeros(cap, bool)
    mask[:n] = True
    return MDState(
        positions=jnp.asarray(pad(np.asarray(positions, np.float64)), dtype),
        velocities=jnp.asarray(pad(np.asarray(velocities, np.float64)), dtype),
        forces=jnp.zeros((cap, 3), dtype),
        species=jnp.asarray(pad(np.asarray(species, np.int32)), jnp.int32),
        masses=jnp.asarray(pad(np.asarray(masses, np.float64), fill=1.0), dtype),
        cell=jnp.asarray(cell, dtype),
        atom_mask=jnp.asarray(mask),
        rng=jax.random.PRNGKey(seed),
        step=jnp.asarray(0, jnp.int32),
        nl_positions=jnp.asarray(pad(np.asarray(positions, np.float64)), dtype),
        edge_src=jnp.zeros(n_edges_cap, jnp.int32),
        edge_dst=jnp.zeros(n_edges_cap, jnp.int32),
        edge_shift=jnp.zeros((n_edges_cap, 3), dtype),
        edge_mask=jnp.zeros(n_edges_cap, bool),
        nl_overflow=jnp.asarray(False),
        potential_energy=jnp.asarray(0.0, dtype),
        stress=jnp.zeros(6, dtype),
        thermo=jnp.zeros((2, 3), dtype),
        baro=jnp.zeros(8, dtype),
        edge_mir=(
            jnp.zeros(n_edges_cap, jnp.int32) if with_mirror else None
        ),
        ring_overflow=jnp.asarray(False) if with_mirror else None,
        atom_index=jnp.arange(cap, dtype=jnp.int32),
        z_numbers=(
            jnp.asarray(pad(np.asarray(atomic_numbers, np.int32)), jnp.int32)
            if d3_edges_cap and atomic_numbers is not None else None
        ),
        d3_edge_src=jnp.zeros(d3_edges_cap, jnp.int32) if d3_edges_cap else None,
        d3_edge_dst=jnp.zeros(d3_edges_cap, jnp.int32) if d3_edges_cap else None,
        d3_edge_shift=jnp.zeros((d3_edges_cap, 3), dtype) if d3_edges_cap else None,
        d3_edge_mask=jnp.zeros(d3_edges_cap, bool) if d3_edges_cap else None,
    )
