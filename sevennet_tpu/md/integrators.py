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
    "mtk_npt_step", "npt_conserved_quantity",
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


def _sinhc(x):
    """sinh(x)/x, series for small x (x is ~v_eps*dt/4 << 1 in practice)."""
    x2 = x * x
    return 1.0 + x2 / 6.0 * (1.0 + x2 / 20.0 * (1.0 + x2 / 42.0))


def _nhc_baro_half(baro, dt: float, temperature: float,
                   tau_p: float, W):
    """Half-step NHC (M=3) thermostatting the single barostat DOF
    (kinetic term W*v_eps^2); takes and returns the (8,) baro vector
    [v_eps, xi(3), vxi(3), eps_log] — shared with the distributed engine's
    replicated barostat state."""
    kT = KB_EV * temperature
    v_eps = baro[0]
    xi = baro[1:4]
    vxi = baro[4:7]
    Q = jnp.full((3,), kT * tau_p * tau_p, baro.dtype)

    dt2, dt4, dt8 = dt / 2.0, dt / 4.0, dt / 8.0
    ke2 = W * v_eps * v_eps
    G2 = (Q[1] * vxi[1] ** 2 - kT) / Q[2]
    vxi = vxi.at[2].add(G2 * dt4)
    for j in (1, 0):
        vxi = vxi.at[j].multiply(jnp.exp(-dt8 * vxi[j + 1]))
        G = (
            (ke2 - kT) / Q[0]
            if j == 0
            else (Q[j - 1] * vxi[j - 1] ** 2 - kT) / Q[j]
        )
        vxi = vxi.at[j].add(G * dt4)
        vxi = vxi.at[j].multiply(jnp.exp(-dt8 * vxi[j + 1]))
    scale = jnp.exp(-dt2 * vxi[0])
    v_eps = v_eps * scale
    ke2 = ke2 * scale * scale
    xi = xi + dt2 * vxi
    for j in (0, 1):
        vxi = vxi.at[j].multiply(jnp.exp(-dt8 * vxi[j + 1]))
        G = (
            (ke2 - kT) / Q[0]
            if j == 0
            else (Q[j - 1] * vxi[j - 1] ** 2 - kT) / Q[j]
        )
        vxi = vxi.at[j].add(G * dt4)
        vxi = vxi.at[j].multiply(jnp.exp(-dt8 * vxi[j + 1]))
    G2 = (Q[1] * vxi[1] ** 2 - kT) / Q[2]
    vxi = vxi.at[2].add(G2 * dt4)
    return jnp.concatenate(
        [v_eps[None], xi, vxi, baro[7:]]
    )


def mtk_npt_step(
    state: MDState,
    forces_fn,
    dt: float,
    temperature: float,
    pressure: float = 0.0,
    tau_t: float = 100.0,
    tau_p: float = 1000.0,
) -> MDState:
    """Martyna-Tobias-Klein isotropic NPT: a correct-ensemble barostat
    (Nose-Hoover piston + its own NHC) on top of the particle NHC — the
    TPU-native analogue of LAMMPS ``fix npt`` that the reference's users
    get from the LAMMPS host (``tests/lammps_tests/`` run fix npt inputs).

    Trotter splitting (Tuckerman, *Statistical Mechanics* ch. 5;
    Martyna et al., Mol. Phys. 87, 1117 (1996)):
    chains -> v_eps -> v -> (r, h) full step -> forces -> v -> v_eps ->
    chains. ``pressure`` target in eV/A^3; taus in fs.

    The conserved quantity is :func:`npt_conserved_quantity`.
    """
    mask = state.atom_mask[:, None]
    dtype = state.positions.dtype
    kT = KB_EV * temperature
    nf = 3.0 * jnp.maximum(jnp.sum(state.atom_mask), 1).astype(dtype)
    W = (nf + 3.0) * kT * tau_p * tau_p
    alpha = 1.0 + 3.0 / nf
    dt2, dt4 = dt / 2.0, dt / 4.0

    def veps_half(state):
        ke2 = 2.0 * state.kinetic_energy()
        p_int = state.pressure()
        vol = state.volume()
        G = (3.0 * vol * (p_int - pressure) + (3.0 / nf) * ke2) / W
        return state.replace(baro=state.baro.at[0].add(dt2 * G))

    def kick(state):
        vf = jnp.exp(-dt2 * alpha * state.baro[0])
        sf = jnp.exp(-dt4 * alpha * state.baro[0]) * _sinhc(
            dt4 * alpha * state.baro[0]
        )
        v = state.velocities * vf + dt2 * _accel(state) * sf
        return state.replace(velocities=v * mask)

    # -- chains (baro NHC + particle NHC), then v_eps, then v ----------------
    state = state.replace(baro=_nhc_baro_half(state.baro, dt, temperature, tau_p, W))
    scale, thermo = _nhc_half(state, dt, temperature, tau_t)
    state = state.replace(velocities=state.velocities * scale, thermo=thermo)
    state = veps_half(state)
    state = kick(state)

    # -- full-step position/cell update under the piston ---------------------
    v_eps = state.baro[0]
    ef = jnp.exp(dt * v_eps)
    rf = jnp.exp(dt2 * v_eps) * _sinhc(dt2 * v_eps)
    x = state.positions * ef + dt * state.velocities * rf
    state = state.replace(
        positions=jnp.where(mask, x, state.positions),
        nl_positions=state.nl_positions * ef,
        cell=state.cell * ef,
        baro=state.baro.at[7].add(dt * v_eps),
    )
    forces, energy, stress = forces_fn(state)
    state = state.replace(forces=forces, potential_energy=energy, stress=stress)

    # -- mirror: v, v_eps, chains --------------------------------------------
    state = kick(state)
    state = veps_half(state)
    scale, thermo = _nhc_half(state, dt, temperature, tau_t)
    state = state.replace(velocities=state.velocities * scale, thermo=thermo)
    state = state.replace(baro=_nhc_baro_half(state.baro, dt, temperature, tau_p, W))
    return state.replace(step=state.step + 1)


def npt_conserved_quantity(
    state: MDState, temperature: float, pressure: float,
    tau_t: float = 100.0, tau_p: float = 1000.0,
):
    """The MTK NPT invariant H' (eV): PE + KE + thermostat/barostat terms +
    P_ext V. Drift of H' over a run is the correctness measure (the NPT
    analogue of NVE total-energy drift)."""
    kT = KB_EV * temperature
    dtype = state.positions.dtype
    nf = 3.0 * jnp.maximum(jnp.sum(state.atom_mask), 1).astype(dtype)
    W = (nf + 3.0) * kT * tau_p * tau_p
    q1 = nf * kT * tau_t * tau_t
    qj = kT * tau_t * tau_t
    Q = jnp.stack([q1, qj, qj])
    Qb = jnp.full((3,), kT * tau_p * tau_p, dtype)
    xi, vxi = state.thermo[0], state.thermo[1]
    v_eps = state.baro[0]
    xib, vxib = state.baro[1:4], state.baro[4:7]
    h = state.potential_energy + state.kinetic_energy()
    h = h + 0.5 * W * v_eps * v_eps + pressure * state.volume()
    h = h + 0.5 * jnp.sum(Q * vxi * vxi) + nf * kT * xi[0] + kT * jnp.sum(xi[1:])
    h = h + 0.5 * jnp.sum(Qb * vxib * vxib) + kT * jnp.sum(xib)
    return h


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
