from .state import MDState, ATOMIC_MASSES, init_md_state
from .neighbor import CellListSpec, build_cell_list_spec, rebuild_neighbors
from .integrators import nve_step, langevin_step
from .engine import MDEngine

__all__ = [
    "MDState",
    "ATOMIC_MASSES",
    "init_md_state",
    "CellListSpec",
    "build_cell_list_spec",
    "rebuild_neighbors",
    "nve_step",
    "langevin_step",
    "MDEngine",
]
