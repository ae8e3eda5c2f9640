"""Round-4 probe: run the reference's deployed TorchScript artifact
(/root/reference/example_inputs/md_serial_example/deployed_serial.pt)
black-box on a small HfO2 structure and compare E/F against this
framework loaded from cp_0.pth.

Input contract replicated from /root/reference/sevenn/pair_e3gnn/pair_e3gnn.cpp:136-207:
  x          : (N,) int64 type indices (Hf=0, O=1 per metadata)
  edge_index : (2, E) int64, [i_center; j_neighbor], full (both directions)
  edge_vec   : (E, 3) float32 = x_j - x_i (+ PBC shift), requires_grad
  num_atoms  : (1,) int64
  nlocal     : (1,) int64 on CPU
Force on atom i = +sum_{edges with src=i} dE/dr - sum_{edges with dst=i} dE/dr.
"""
import os, sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np

sys.path.insert(0, "/root/repo")

import torch

DEPLOYED = "/root/reference/example_inputs/md_serial_example/deployed_serial.pt"
CP = "/root/reference/tests/data/checkpoints/cp_0.pth"


def hfo2():
    rng = np.random.default_rng(42)
    a = 5.1
    cell = np.eye(3) * a
    frac = np.array(
        [
            [0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5],
            [0.25, 0.25, 0.25], [0.75, 0.75, 0.25], [0.75, 0.25, 0.75],
            [0.25, 0.75, 0.75], [0.75, 0.75, 0.75], [0.25, 0.25, 0.75],
            [0.25, 0.75, 0.25], [0.75, 0.25, 0.25],
        ]
    )
    pos = frac @ cell + rng.normal(scale=0.05, size=(12, 3))
    Z = np.array([72] * 4 + [8] * 8)
    return pos, Z, cell


def run_torch(pos, Z, cell, cutoff):
    """Drive the deployed (v0.8.6, EdgePreprocess-embedded) TorchScript model.

    Its EdgePreprocess (/root/reference/sevenn/nn/edge_embedding.py:12-78)
    computes edge_vec = pos[edge_index[1]] - pos[edge_index[0]] + shift @ cell,
    so edge_index[0] is the receiver (center) and [1] the sender.
    """
    from sevennet_tpu.data import neighbor_list_numpy

    ef = {"chemical_symbols_to_index": b"", "cutoff": b""}
    m = torch.jit.load(DEPLOYED, map_location="cpu", _extra_files=ef)
    m.eval()
    syms = ef["chemical_symbols_to_index"].decode().split()
    print("deployed symbols:", syms, "cutoff:", ef["cutoff"].decode())
    sym_of_z = {72: "Hf", 8: "O"}
    types = np.array([syms.index(sym_of_z[z]) for z in Z])

    dst, src, shifts = neighbor_list_numpy(pos, cutoff, cell, True)
    E = len(src)
    pos_t = torch.tensor(pos, dtype=torch.float32, requires_grad=True)
    data = {
        "x": torch.tensor(types, dtype=torch.long),
        "pos": pos_t,
        "cell_lattice_vectors": torch.tensor(cell, dtype=torch.float32),
        "pbc_shift": torch.tensor(shifts, dtype=torch.float32),
        "cell_volume": torch.tensor(abs(np.linalg.det(cell)), dtype=torch.float32),
        "edge_index": torch.tensor(np.stack([dst, src]), dtype=torch.long),
        "batch": torch.zeros(len(pos), dtype=torch.long),
        "num_atoms": torch.tensor([len(pos)], dtype=torch.long),
        "nlocal": torch.tensor([len(pos)], dtype=torch.long),
    }
    out = m(data)
    energy = float(out["inferred_total_energy"].squeeze().detach())
    F = out["inferred_force"].detach().numpy()
    S = out.get("inferred_stress")
    S = S.detach().numpy() if S is not None else None
    return energy, F, S, E


def run_jax(pos, Z, cell):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")  # sitecustomize overrides env var
    from sevennet_tpu.io.torchscript_import import load_deployed_model
    from sevennet_tpu.data import batch_graphs, graph_from_arrays, neighbor_list_numpy
    from sevennet_tpu.model.model import model_compute
    import jax

    spec, params = load_deployed_model(DEPLOYED)
    print("imported cutoff:", spec.cutoff)
    species = spec.z_to_type[Z]
    dst, src, shifts = neighbor_list_numpy(pos, spec.cutoff, cell, True)
    g = graph_from_arrays(pos, species, src, dst, shifts, cell)
    gb = batch_graphs([g], n_atoms_cap=16, n_edges_cap=400)
    out = jax.jit(lambda p, g: model_compute(spec, p, g))(params, gb)
    return float(out["energy"][0]), np.asarray(out["forces"])[: len(pos)], spec.cutoff


if __name__ == "__main__":
    pos, Z, cell = hfo2()
    e_j, f_j, cutoff = run_jax(pos, Z, cell)
    e_t, f_t, s_t, E = run_torch(pos, Z, cell, cutoff)
    print(f"edges: {E}")
    print(f"E torch={e_t:.6f}  jax={e_j:.6f}  diff={abs(e_t-e_j):.3e}")
    d = np.abs(f_t - f_j)
    print(f"F maxdiff={d.max():.3e}  MAE={d.mean():.3e}")
    if s_t is not None:
        print("stress (dE/dstrain/vol):\n", s_t)
