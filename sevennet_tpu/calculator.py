"""Single-point calculator (the TPU analogue of the reference
``SevenNetCalculator``, ``sevenn/calculator.py:20-233``).

Design differences from the torch reference, driven by XLA's compile-once
model:

- graphs are padded to bucketed capacities so repeated calls with similar
  system sizes reuse one compiled executable; capacities grow geometrically
  (x1.25, like the reference's adaptive edge bound, ``pair_e3gnn.cpp:283-288``);
- the jitted function computes energy+forces+stress in one fused program;
- results use ASE conventions: ``stress`` in eV/A^3, Voigt order
  (xx,yy,zz,yz,xz,xy) with the sign flip the reference applies at
  ``calculator.py:198-203``.

Works with :class:`~sevennet_tpu.atoms.AtomsLite` or real ``ase.Atoms``.
If ASE is importable, :func:`SevenNetTPUCalculator.as_ase` returns a genuine
``ase.calculators.calculator.Calculator`` subclass.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import numpy as np

from .atoms import as_atoms
from .data.graph import batch_graphs, graph_from_arrays
from .data.neighborlist import neighbor_list_numpy
from .model.build import ModelSpec
from .model.model import model_compute

__all__ = ["SevenNetTPUCalculator"]

# reorder model stress (xx,yy,zz,xy,yz,zx) -> ASE voigt (xx,yy,zz,yz,xz,xy)
_VOIGT_REORDER = (0, 1, 2, 4, 5, 3)


def _bucket(n: int, base: int = 16, factor: float = 1.25) -> int:
    """Smallest capacity of the geometric bucket ladder holding n."""
    cap = base
    while cap < n:
        cap = int(math.ceil(cap * factor))
    return cap


class SevenNetTPUCalculator:
    def __init__(
        self,
        model: str | ModelSpec = None,
        params: Optional[Dict[str, Any]] = None,
        matmul_precision: str = "highest",
        compute_stress: bool = True,
        fused: Optional[bool] = None,
    ):
        """``model`` is a path to a SevenNet ``.pth`` checkpoint, a path to a
        native checkpoint directory, a pretrained name ("7net-0", ...), or an
        already-built ``ModelSpec`` (then ``params`` must be given).

        ``fused`` switches single points to the dense (N, K) layout + fused
        Pallas conv kernels (default on TPU, like the MD engine)."""
        if isinstance(model, ModelSpec):
            assert params is not None
            spec = model
        else:
            # path, native checkpoint dir, or pretrained name ("7net-0", ...)
            from .io.registry import load_model

            spec, params = load_model(str(model))
        self.spec = spec
        self.params = params
        self.compute_stress = compute_stress
        self._precision = matmul_precision
        if fused is None:
            import os

            env = os.environ.get("SEVENNET_TPU_FUSED")
            if env is not None:
                fused = bool(int(env))
            else:
                fused = jax.default_backend() == "tpu"
        self.fused = bool(fused)
        self._jitted = {}
        self.results: Dict[str, Any] = {}

    # -- core -----------------------------------------------------------------
    def _compute_fn(self, dense_k: int = 0):
        key = ("fn", dense_k)
        if key not in self._jitted:
            import dataclasses

            prec = self._precision
            spec = self.spec
            if dense_k:
                spec = dataclasses.replace(
                    spec, edge_dense_k=dense_k, conv_fused=True,
                    conv_param_grads=False, edge_chunk=0,
                )

            def fn(params, graph):
                with jax.default_matmul_precision(prec):
                    return model_compute(spec, params, graph, self.compute_stress)

            self._jitted[key] = jax.jit(fn)
        return self._jitted[key]

    def calculate(self, atoms) -> Dict[str, Any]:
        at = as_atoms(atoms)
        n = len(at)
        species = self.spec.z_to_type[at.numbers]
        if (species < 0).any():
            bad = sorted(set(at.numbers[species < 0].tolist()))
            raise ValueError(f"model does not know atomic numbers {bad}")

        dst, src, shifts = neighbor_list_numpy(
            at.positions, self.spec.cutoff, at.cell, at.pbc
        )
        g = graph_from_arrays(
            at.positions, species, src, dst, shifts,
            at.cell if at.cell is not None else None,
        )
        if self.fused:
            from .ops.fused_conv import (
                fused_conv_block_atoms,
                mirror_map_numpy,
            )

            counts = np.bincount(np.asarray(dst), minlength=n)
            k = -(-_bucket(max(int(counts.max(initial=1)), 1)) // 8) * 8
            A = fused_conv_block_atoms(k)
            n_cap = -(-_bucket(n) // A) * A
            gb = batch_graphs([g], n_atoms_cap=n_cap, dense_k=k)
            mir = mirror_map_numpy(
                np.asarray(gb.edge_src).reshape(n_cap, k),
                np.asarray(gb.edge_shift).reshape(n_cap, k, 3),
                np.asarray(gb.edge_mask).reshape(n_cap, k),
            )
            gb = gb.replace(edge_mir=mir.reshape(-1))
            out = self._compute_fn(k)(self.params, gb)
        else:
            gb = batch_graphs(
                [g], n_atoms_cap=_bucket(n), n_edges_cap=_bucket(max(len(dst), 1))
            )
            out = self._compute_fn()(self.params, gb)

        energy = float(out["energy"][0])
        forces = np.asarray(out["forces"])[:n]
        energies = np.asarray(out["atomic_energy"])[:n]
        results = {
            "energy": energy,
            "free_energy": energy,
            "forces": forces,
            "energies": energies,
        }
        if self.compute_stress and at.cell is not None and at.pbc.any():
            s = np.asarray(out["stress"])[0]
            results["stress"] = -s[list(_VOIGT_REORDER)]
            results["atomic_virial"] = np.asarray(out["atomic_virial"])[:n]
        self.results = results
        return results

    # -- ASE-style convenience ------------------------------------------------
    def get_potential_energy(self, atoms) -> float:
        return self.calculate(atoms)["energy"]

    def get_forces(self, atoms) -> np.ndarray:
        return self.calculate(atoms)["forces"]

    def get_stress(self, atoms) -> np.ndarray:
        return self.calculate(atoms)["stress"]

    def with_d3(self, functional: str = "pbe", damping_type: str = "damp_bj",
                **d3_kwargs) -> "SevenNetD3Calculator":
        return SevenNetD3Calculator(self, functional, damping_type, **d3_kwargs)

    def as_ase(self):
        """Return a real ``ase.calculators`` Calculator wrapping this one
        (requires ASE installed)."""
        from ase.calculators.calculator import Calculator, all_changes

        parent = self

        class _ASECalc(Calculator):
            implemented_properties = [
                "energy", "free_energy", "forces", "stress", "energies",
            ]

            def calculate(self, atoms=None, properties=None, system_changes=all_changes):
                super().calculate(atoms, properties, system_changes)
                self.results = dict(parent.calculate(atoms))

        return _ASECalc()


class SevenNetD3Calculator:
    """Model + Grimme D3 dispersion (the reference's ``SevenNetD3Calculator``,
    ``sevenn/calculator.py:236-314`` — a SumCalculator of both)."""

    def __init__(self, base: SevenNetTPUCalculator | str, functional: str = "pbe",
                 damping_type: str = "damp_bj", **d3_kwargs):
        from .d3 import D3Calculator

        if not isinstance(base, SevenNetTPUCalculator):
            base = SevenNetTPUCalculator(base)
        self.base = base
        self.d3 = D3Calculator(functional, damping_type, **d3_kwargs)
        self.results: Dict[str, Any] = {}

    def calculate(self, atoms) -> Dict[str, Any]:
        a = self.base.calculate(atoms)
        b = self.d3.calculate(atoms)
        out = dict(a)
        out["energy"] = a["energy"] + b["energy"]
        out["free_energy"] = out["energy"]
        out["forces"] = a["forces"] + b["forces"]
        if "stress" in a and "stress" in b:
            out["stress"] = a["stress"] + b["stress"]
        self.results = out
        return out

    def get_potential_energy(self, atoms) -> float:
        return self.calculate(atoms)["energy"]

    def get_forces(self, atoms):
        return self.calculate(atoms)["forces"]
