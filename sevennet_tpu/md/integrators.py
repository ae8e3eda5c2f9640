"""Integrators: velocity-Verlet NVE and Langevin (BAOAB) NVT.

Pure functions over :class:`~sevennet_tpu.md.state.MDState`; the force
evaluation is supplied by the engine so integrators stay model-agnostic.
Replaces the role LAMMPS plays for the reference (``fix nve`` /
``fix langevin`` in the LAMMPS test inputs, ``tests/lammps_tests``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .state import EV_A_AMU_TO_A_FS2, KB_EV, MDState

__all__ = ["nve_step", "langevin_step"]


def _accel(state: MDState):
    return (
        state.forces
        / state.masses[:, None]
        * EV_A_AMU_TO_A_FS2
        * state.atom_mask[:, None]
    )


def nve_step(state: MDState, forces_fn, dt: float) -> MDState:
    """One velocity-Verlet step. ``forces_fn(state) -> (forces, energy)``
    using the state's current neighbor list."""
    a = _accel(state)
    v_half = state.velocities + 0.5 * dt * a
    x_new = state.positions + dt * v_half * state.atom_mask[:, None]
    state = state.replace(positions=x_new)
    forces, energy = forces_fn(state)
    state = state.replace(forces=forces, potential_energy=energy)
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
    forces, energy = forces_fn(state)
    state = state.replace(forces=forces, potential_energy=energy)
    # B
    v = v + 0.5 * dt * _accel(state)
    return state.replace(velocities=v * mask, step=state.step + 1)
