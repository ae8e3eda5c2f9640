#!/usr/bin/env python
"""Benchmark: MD throughput of the flagship SevenNet-0 architecture.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Measures NVE MD steps/s on water boxes at the BASELINE.json target sizes —
**10k and 100k atoms** — with the SevenNet-0 architecture (cutoff 5.0 A,
5 conv layers, 128x0e+64x1e+32x2e, lmax 2, SO(3); see the reference preset
``sevenn/presets/sevennet-0.yaml``) and randomly initialized weights
(throughput is weight-independent), converted to ns/day at dt=2 fs.

Baseline: the reference publishes no ns/day figures (BASELINE.md). We use
a single self-consistent **per-atom** A100 GPU-LAMMPS estimate for
SevenNet-0 of 1.2e5 atom-steps/s, applied at each size:
ns/day_baseline(N) = 1.2e5 / N * 2 fs * 86.4. The headline
``vs_baseline`` is the MINIMUM ratio across the measured sizes (the
conservative reading); per-size results are in ``extra.sizes``.

Env knobs: BENCH_SIZES="9999,99999" (comma list; also accepts single
BENCH_ATOMS for ad-hoc runs), BENCH_PRECISION, BENCH_CHUNK/BENCH_STEPS
(per-run overrides), BENCH_NO_CHECK=1 to skip the 3k force-accuracy guard.
"""

import faulthandler
import json
import os
import signal
import sys
import time

# kill -USR1 <pid> dumps all thread stacks to stderr (the axon tunnel
# can block indefinitely inside device ops; this identifies where)
faulthandler.register(signal.SIGUSR1)

# persist the compilation cache UNDER THE REPO: /tmp may be wiped between
# the build session and the driver's end-of-round bench run, and the 100k
# compile is minutes-long (round-4 lesson: it blew the driver's budget).
# Pre-warming bench.py during the round makes the driver's run hit cache.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sevennet_tpu.model import build_model_spec
from sevennet_tpu.model.model import model_init
from sevennet_tpu.md import MDEngine

DT_FS = 2.0  # production timestep used for the ns/day conversion
# integration dt during the benchmark: tiny, so the (randomly initialized)
# model's unphysical forces cannot blow up the neighbor list — the per-step
# COST is dt-independent
BENCH_DT = float(os.environ.get("BENCH_DT", 0.01))
# A100 GPU-LAMMPS per-atom estimate for SevenNet-0 (see module docstring)
BASELINE_ATOM_STEPS_PER_S = 1.2e5


def water_box(n_molecules: int, density_g_cm3: float = 1.0, seed: int = 0):
    """Simple-cubic lattice of water molecules (good enough for perf)."""
    mass_h2o = 18.015
    n_av = 6.02214076e23
    vol_cm3 = n_molecules * mass_h2o / (n_av * density_g_cm3)
    box = (vol_cm3 ** (1 / 3)) * 1e8  # cm -> Angstrom
    n_side = int(np.ceil(n_molecules ** (1 / 3)))
    a = box / n_side
    rng = np.random.default_rng(seed)
    pos, Z = [], []
    count = 0
    for i in range(n_side):
        for j in range(n_side):
            for k in range(n_side):
                if count >= n_molecules:
                    break
                o = (np.array([i, j, k]) + 0.5) * a
                pos += [o, o + [0.757, 0.586, 0.0], o + [-0.757, 0.586, 0.0]]
                Z += [8, 1, 1]
                count += 1
    pos = np.asarray(pos) + rng.normal(scale=0.01, size=(len(pos), 3))
    return pos, np.asarray(Z), np.eye(3) * box


def flagship_spec(n_atoms: int, edge_chunk=None, remat=None):
    arch = os.environ.get("BENCH_ARCH", "sevennet-0")
    if arch == "l3i5":
        # 7net-l3i5 (reference presets/l3i5.yaml): lmax 3, 5 layers,
        # 128x0e+64x1e+32x2e+32x3e, poly cutoff, nequip self-connection;
        # reference reports ~4x slower than 7net-0
        # (docs/old_readme/README.md:112)
        arch_cfg = {
            "lmax": 3,
            "irreps_manual": [
                "128x0e",
                "128x0e+64x1e+32x2e+32x3e",
                "128x0e+64x1e+32x2e+32x3e",
                "128x0e+64x1e+32x2e+32x3e",
                "128x0e+64x1e+32x2e+32x3e",
                "128x0e",
            ],
            "cutoff_function": {
                "cutoff_function_name": "poly_cut", "poly_cut_p_value": 6,
            },
            "self_connection_type": "nequip",
        }
    else:
        arch_cfg = {
            "lmax": 2,
            "irreps_manual": [
                "128x0e",
                "128x0e+64x1e+32x2e",
                "128x0e+64x1e+32x2e",
                "128x0e+64x1e+32x2e",
                "128x0e+64x1e+32x2e",
                "128x0e",
            ],
            "cutoff_function": {"cutoff_function_name": "XPLOR", "cutoff_on": 4.5},
            "self_connection_type": "linear",
        }
    return build_model_spec(
        {
            **arch_cfg,
            "cutoff": 5.0,
            "channel": 128,
            "is_parity": False,
            "num_convolution_layer": 5,
            "weight_nn_hidden_neurons": [64, 64],
            "radial_basis": {"radial_basis_name": "bessel", "bessel_basis_num": 8},
            "conv_denominator": 35.0,
            "chemical_species": ["H", "O"],
            # memory policy: the fused-conv custom_vjp (default on TPU)
            # already recomputes its interior, so remat only helps the XLA
            # fallback path; edge_chunk streams the fused conv in row
            # chunks (edge_chunk/K atoms each) only above the 3 GB gather
            # threshold (20k+ atoms) — sized for ~2k-atom chunks
            "_edge_chunk": int(
                os.environ.get("BENCH_EDGE_CHUNK", 163840 if n_atoms > 12000 else 0)
            ) if edge_chunk is None else edge_chunk,
            "_remat": (
                bool(int(os.environ.get("BENCH_REMAT", 0)))
                if remat is None else remat
            ),
        }
    )


def _stamp(msg):
    print(f"# [t={time.perf_counter() - T_START:8.1f}s] {msg}",
          file=sys.stderr, flush=True)


T_START = time.perf_counter()


def run_size(n_atoms: int, n_steps: int, chunk: int):
    """One timed NVE run; returns the per-size result dict."""
    n_mol = n_atoms // 3
    pos, Z, cell = water_box(n_mol)
    n = len(Z)
    spec = flagship_spec(n)
    params = model_init(jax.random.PRNGKey(0), spec)
    engine = MDEngine(
        spec, params, cell,
        matmul_precision=os.environ.get("BENCH_PRECISION", "default"),
    )
    if n_steps % chunk:
        # a partial tail chunk would compile a SECOND scan inside the
        # timed loop and corrupt the measurement
        n_steps = max(chunk, (n_steps // chunk) * chunk)
    _stamp(f"[{n}] building state...")
    # compute_forces=False skips the standalone fwd+bwd compile (minutes
    # at 100k); the warmup chunk below compiles/provides everything timed
    state = engine.make_state(pos, Z, temperature=300.0, compute_forces=False)
    _stamp(
        f"[{n}] K={engine.k_model} ring: RC={engine.row_chunk} "
        f"nb={engine._ring_nb} W={engine._ring_w} sort={engine.sort_atoms}"
    )
    _stamp(f"[{n}] compiling+warmup...")
    # warmup with the SAME chunk length as the timed run: one scan compile
    state, _ = engine.run(state, chunk, dt=BENCH_DT, integrator="nve", chunk=chunk)
    float(state.potential_energy)  # force completion through the tunnel
    _stamp(f"[{n}] timing {n_steps} steps...")

    t0 = time.perf_counter()
    state, _ = engine.run(state, n_steps, dt=BENCH_DT, integrator="nve", chunk=chunk)
    float(state.potential_energy)
    elapsed = time.perf_counter() - t0

    steps_per_s = n_steps / elapsed
    atom_steps = steps_per_s * n
    ns_day = steps_per_s * DT_FS * 1e-6 * 86400
    base_ns_day = BASELINE_ATOM_STEPS_PER_S / n * DT_FS * 1e-6 * 86400
    res = {
        "n_atoms": n,
        "ms_per_step": round(1e3 / steps_per_s, 2),
        "atom_steps_per_s": round(atom_steps, 1),
        "ns_day": round(ns_day, 4),
        "baseline_ns_day": round(base_ns_day, 4),
        "vs_baseline": round(atom_steps / BASELINE_ATOM_STEPS_PER_S, 4),
    }
    _stamp(f"[{n}] {res}")
    return res, (spec, params, cell, pos, Z, engine)


def emit(results, guards, planned_sizes):
    """Print the cumulative headline JSON line (stdout).

    Called after EVERY completed size and guard, not just at the end: the
    driver runs this script under a wall-clock budget and parses the LAST
    JSON line it sees, so a timeout mid-100k must still leave the sizes
    that DID finish on record (round-4 lesson: one slow compile erased
    the whole round's metric).
    """
    if not results:
        return
    headline = min(results, key=lambda r: r["vs_baseline"])
    label = "+".join(str(r["n_atoms"]) for r in results)
    print(
        json.dumps(
            {
                "metric": f"sevennet0_water_nve_md_{label}atoms",
                "value": headline["ns_day"],
                "unit": "ns/day",
                # conservative: the WORST per-atom ratio across the
                # BASELINE target sizes, against one self-consistent
                # per-atom A100 estimate (1.2e5 atom-steps/s)
                "vs_baseline": headline["vs_baseline"],
                "extra": {
                    "sizes": results,
                    "planned_sizes": planned_sizes,
                    "baseline_atom_steps_per_s": BASELINE_ATOM_STEPS_PER_S,
                    "device": str(jax.devices()[0].platform),
                    "force_maxdiff_vs_fp32": guards.get("3k"),
                    "force_maxdiff_vs_fp32_chunked_20k": guards.get("20k"),
                },
            }
        ),
        flush=True,
    )


def force_guard(n_molecules: int, ref_kwargs=None, ref_fused=False,
                fast_env=None):
    """Max |F_fast - F_ref| between the timed path and a reference path.

    ``ref_fused=False``: reference is the fp32 XLA dense path (HIGHEST
    matmuls) — the exactness anchor, memory-feasible up to ~12k atoms on a
    16 GB chip (at 20k it needs 24 GB even rematerialized — measured OOM,
    round 5). ``ref_fused=True``: reference is the UNCHUNKED fused path
    (in-kernel dots are always fp32-exact); use it above 12k where the
    XLA reference cannot fit — its own correctness is pinned by the 3k
    guard against fp32 XLA. Any failure returns the error string instead
    of raising: a guard must never kill the remaining bench sizes."""
    saved = {}
    try:
        # fast_env: temporary knobs for the FAST engine only (e.g. a
        # lowered chunk threshold so the 20k guard exercises the same
        # ring/sorted path the 100k timing uses)
        for k, v in (fast_env or {}).items():
            saved[k] = os.environ.get(k)
            os.environ[k] = str(v)
        posc, Zc, cellc = water_box(n_molecules)
        specc = flagship_spec(len(Zc))
        paramsc = model_init(jax.random.PRNGKey(0), specc)
        fast = MDEngine(
            specc, paramsc, cellc,
            matmul_precision=os.environ.get("BENCH_PRECISION", "default"),
        )
        if not fast.fused:
            return None
        stf = fast.make_state(posc, Zc)
        ff = np.asarray(stf.forces)
        if stf.atom_index is not None:
            # cell-sorted engines permute atoms; map back to input order
            unperm = np.empty((len(Zc), 3), ff.dtype)
            idx = np.asarray(stf.atom_index)
            ok = idx < len(Zc)  # padded rows carry indices >= n
            unperm[idx[ok]] = ff[ok]
            ff = unperm
        else:
            ff = ff[: len(Zc)]
        for k, v in saved.items():
            os.environ.pop(k, None) if v is None else os.environ.update({k: v})
        saved = {}
        spec_ref = flagship_spec(len(Zc), **(ref_kwargs or {}))
        ref = MDEngine(spec_ref, paramsc, cellc, fused=ref_fused,
                       matmul_precision="highest")
        fr = np.asarray(ref.make_state(posc, Zc).forces)[: len(Zc)]
        return float(np.abs(fr - ff).max())
    except Exception as e:
        return f"{type(e).__name__}: {e}"[:300]
    finally:
        for k, v in saved.items():
            os.environ.pop(k, None) if v is None else os.environ.update({k: v})


def main():
    single = os.environ.get("BENCH_ATOMS")
    if single:
        sizes = [int(single)]
    else:
        sizes = [
            int(s) for s in os.environ.get("BENCH_SIZES", "9999,99999").split(",")
        ]
    # steps/chunk scaled so each size times ~30-60 s of useful work
    plan = {}
    for n in sizes:
        if n >= 50000:
            plan[n] = (10, 5)
        elif n >= 8000:
            plan[n] = (40, 20)
        else:
            plan[n] = (60, 20)
    if os.environ.get("BENCH_STEPS"):
        st = int(os.environ["BENCH_STEPS"])
        ch = int(os.environ.get("BENCH_CHUNK", max(1, st // 3)))
        plan = {n: (st, ch) for n in sizes}

    # cheapest-first: small sizes land a parseable result early; the
    # expensive 100k compile goes LAST so it can only add, never erase
    sizes = sorted(sizes)
    results = []
    guards = {}
    emitted_guards = False
    for n in sizes:
        st, ch = plan[n]
        try:
            res, _ = run_size(n, st, ch)
        except Exception as e:  # one failing size must not erase the rest
            _stamp(f"[{n}] FAILED: {type(e).__name__}: {e}")
            continue
        results.append(res)
        emit(results, guards, sizes)

        # accuracy guards run right after the FIRST completed size — before
        # the big-system compiles, so a 100k timeout cannot skip them.
        # Guard 1 (3k): fused kernels vs the fp32-exact XLA dense path.
        # Guard 2 (20k): the row-chunked/ring regime (engages >12k atoms
        # only, so the 3k check cannot see it) vs the rematerialized fp32
        # XLA dense path.
        if not emitted_guards and not int(os.environ.get("BENCH_NO_CHECK", 0)):
            emitted_guards = True
            _stamp("force check vs fp32 XLA path (3k)...")
            guards["3k"] = force_guard(1000)
            _stamp(f"force maxdiff: {guards['3k']}")
            if any(s > 12000 for s in sizes):
                _stamp("force check vs unchunked fused (20k, ring/chunked "
                       "regime; fp32 XLA ref OOMs at this size)...")
                # the threshold override engages the SAME sorted ring
                # path the 100k timing uses (it would otherwise only
                # engage above ~30k atoms and escape the guard)
                guards["20k"] = force_guard(
                    6667, ref_kwargs={"edge_chunk": 0}, ref_fused=True,
                    fast_env={"SEVENNET_TPU_CHUNK_THRESHOLD": 1_000_000_000})
                _stamp(f"chunked force maxdiff: {guards['20k']}")
            emit(results, guards, sizes)
    emit(results, guards, sizes)


if __name__ == "__main__":
    main()
