"""Integrators: velocity-Verlet NVE, Langevin (BAOAB) NVT, Nose-Hoover
chain NVT, Berendsen NPT.

Pure functions over :class:`~sevennet_tpu.md.state.MDState`; the force
evaluation is supplied by the engine so integrators stay model-agnostic.
Replaces the role LAMMPS plays for the reference (``fix nve`` /
``fix langevin`` / ``fix npt`` in the LAMMPS test inputs,
``tests/lammps_tests``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .state import EV_A_AMU_TO_A_FS2, KB_EV, MDState

__all__ = [
    "nve_step", "langevin_step", "nose_hoover_step", "berendsen_npt_step",
]


def _accel(state: MDState):
    return (
        state.forces
        / state.masses[:, None]
        * EV_A_AMU_TO_A_FS2
        * state.atom_mask[:, None]
    )


def nve_step(state: MDState, forces_fn, dt: float) -> MDState:
    """One velocity-Verlet step.
    ``forces_fn(state) -> (forces, energy, stress)`` using the state's
    current neighbor list (stress may be zeros when disabled)."""
    a = _accel(state)
    v_half = state.velocities + 0.5 * dt * a
    x_new = state.positions + dt * v_half * state.atom_mask[:, None]
    state = state.replace(positions=x_new)
    forces, energy, stress = forces_fn(state)
    state = state.replace(forces=forces, potential_energy=energy, stress=stress)
    v_new = v_half + 0.5 * dt * _accel(state)
    return state.replace(
        velocities=v_new * state.atom_mask[:, None], step=state.step + 1
    )


def langevin_step(
    state: MDState, forces_fn, dt: float, temperature: float, friction: float
) -> MDState:
    """BAOAB Langevin: B(half kick) A(half drift) O(thermostat) A B.

    ``friction`` in 1/fs; ``temperature`` in K.
    """
    mask = state.atom_mask[:, None]
    # B
    v = state.velocities + 0.5 * dt * _accel(state)
    # A
    x = state.positions + 0.5 * dt * v * mask
    # O
    rng, key = jax.random.split(state.rng)
    c1 = jnp.exp(-friction * dt)
    sigma = jnp.sqrt(
        (1.0 - c1**2) * KB_EV * temperature / state.masses
    ) * jnp.sqrt(EV_A_AMU_TO_A_FS2)
    noise = jax.random.normal(key, v.shape, dtype=v.dtype)
    v = c1 * v + sigma[:, None] * noise
    # A
    x = x + 0.5 * dt * v * mask
    state = state.replace(positions=x, rng=rng)
    forces, energy, stress = forces_fn(state)
    state = state.replace(forces=forces, potential_energy=energy, stress=stress)
    # B
    v = v + 0.5 * dt * _accel(state)
    return state.replace(velocities=v * mask, step=state.step + 1)


def _nhc_half(state: MDState, dt: float, temperature: float, tau: float):
    """Half-step Nose-Hoover chain (M=3) update; returns (scale, thermo).

    Standard MTK chain sweep (Frenkel & Smit alg. 30): update chain
    velocities backward, compute the particle-velocity scale, update chain
    positions, sweep forward.
    """
    kT = KB_EV * temperature
    ndof = 3.0 * jnp.maximum(jnp.sum(state.atom_mask), 1).astype(
        state.positions.dtype
    )
    ke2 = 2.0 * state.kinetic_energy()  # 2*KE in eV
    xi, vxi = state.thermo[0], state.thermo[1]
    # chain masses (eV*fs^2)
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
    return scale, jnp.stack([xi, vxi])


def nose_hoover_step(
    state: MDState, forces_fn, dt: float, temperature: float, tau: float = 50.0
) -> MDState:
    """Nose-Hoover chain (M=3) NVT: NHC half, velocity-Verlet, NHC half.
    ``tau`` is the thermostat time constant in fs (~50-100 x dt typical)."""
    scale, thermo = _nhc_half(state, dt, temperature, tau)
    state = state.replace(velocities=state.velocities * scale, thermo=thermo)
    state = nve_step(state, forces_fn, dt)
    scale, thermo = _nhc_half(state, dt, temperature, tau)
    return state.replace(velocities=state.velocities * scale, thermo=thermo)


def berendsen_npt_step(
    state: MDState,
    forces_fn,
    dt: float,
    temperature: float,
    pressure: float = 0.0,
    tau_t: float = 100.0,
    tau_p: float = 1000.0,
    compressibility: float = 4.6e-5,
) -> MDState:
    """Berendsen weak-coupling NPT (isotropic).

    ``pressure`` target in eV/A^3; ``compressibility`` in 1/bar (water
    default, as in ASE/LAMMPS conventions); taus in fs. Uses the virial +
    kinetic pressure from the state (engine must compute stress).
    """
    mask = state.atom_mask[:, None]
    # thermostat: velocity rescale toward target T
    t_now = jnp.maximum(state.temperature(), 1e-12)
    lam = jnp.sqrt(1.0 + dt / tau_t * (temperature / t_now - 1.0))
    lam = jnp.clip(lam, 0.9, 1.1)
    state = state.replace(velocities=state.velocities * lam)

    # barostat: isotropic cell scale toward target P
    bar_to_evA3 = 1.0 / 1.602176634e6  # 1 bar in eV/A^3
    beta = compressibility / bar_to_evA3  # (eV/A^3)^-1
    p_now = state.pressure()
    mu = (1.0 - dt / tau_p * beta * (pressure - p_now)) ** (1.0 / 3.0)
    mu = jnp.clip(mu, 0.98, 1.02)
    state = state.replace(
        positions=state.positions * mu,
        nl_positions=state.nl_positions * mu,
        cell=state.cell * mu,
    )
    return nve_step(state, forces_fn, dt)
