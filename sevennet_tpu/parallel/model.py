"""Distributed (domain-decomposed) energy/forces over a device mesh.

Layer-synchronous halo exchange: before every convolution the owned node
features (post self-interaction-1) are shipped to the neighbors' ghost
slots with two ``lax.ppermute`` calls over the 'dd' mesh axis — the
reference's per-segment ``forward_comm`` (``pair_e3gnn_parallel.cpp:358-390``)
riding ICI instead of MPI. The reverse path (``reverse_comm``, ``:404-441``)
is NOT hand-written: the shard_map body returns *local* per-atom energies
with no internal collectives, the global sum happens outside, and
``jax.grad`` through shard_map transposes the ppermutes automatically,
accumulating ghost-feature and ghost-position gradients back into owners.

Stress uses the strain trick in the same backward pass: edge vectors are
strained by a zero (3,3) epsilon input and ``dE/d(eps)`` is the global
virial (cf. the reference's ``EdgePreprocess`` strain injection,
``sevenn/nn/edge_embedding.py:34-61``, and the edge-based virial of
``ForceStressOutputFromEdge``).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..model.build import ModelSpec
from ..model.model import _cutoff_envelope
from ..ops.gate import gate_apply
from ..ops.linear import linear_apply
from ..ops.mlp import scalar_mlp_apply
from ..ops.radial import bessel_basis
from ..ops.tensor_product import conv_tp_apply, fctp_apply
from ..so3.spherical import spherical_harmonics

__all__ = ["distributed_compute", "make_distributed_compute", "dd_to_device_arrays"]


def _exchange(x_local, dd, axis_name="dd"):
    """Ship owned rows to both neighbors; returns ghost rows
    [from-left | from-right] with fixed capacities."""
    n_dev = jax.lax.axis_size(axis_name)
    sl = x_local[dd["send_idx_left"]] * dd["send_mask_left"][..., None].astype(
        x_local.dtype
    )
    sr = x_local[dd["send_idx_right"]] * dd["send_mask_right"][..., None].astype(
        x_local.dtype
    )
    if n_dev == 1:
        return jnp.concatenate([sr, sl], axis=0)
    perm_right = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    perm_left = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    from_left = jax.lax.ppermute(sr, axis_name, perm_right)
    from_right = jax.lax.ppermute(sl, axis_name, perm_left)
    return jnp.concatenate([from_left, from_right], axis=0)


def _local_atomic_energy(spec: ModelSpec, params, dd, cell, pos_local, eps):
    """Per-device atomic energies (masked). Pure; no collectives except
    ppermute halo exchanges. ``eps`` is the (3,3) virial probe."""
    dtype = pos_local.dtype
    n_cap = pos_local.shape[0]
    atom_mask = dd["atom_mask"].astype(dtype)
    edge_mask = dd["edge_mask"]

    ghost_pos = _exchange(pos_local, dd) + dd["ghost_shift"] @ cell
    pos_ext = jnp.concatenate([pos_local, ghost_pos], axis=0)
    ev = (
        pos_ext[dd["edge_src"]]
        - pos_local[dd["edge_dst"]]
        + dd["edge_shift"] @ cell
    )
    ev = ev + ev @ eps  # strain probe: dE/d(eps[b,a]) = sum_e r_b f_a
    ev = jnp.where(edge_mask[:, None], ev, jnp.array([1.0, 0.0, 0.0], dtype))

    r = jnp.linalg.norm(ev, axis=-1)
    basis = bessel_basis(r, params["edge_embedding"]["bessel_coeffs"], spec.cutoff)
    env = _cutoff_envelope(spec, r)
    edge_emb = basis * (env * edge_mask.astype(dtype))[:, None]
    sh = spherical_harmonics(spec.lmax_edge, ev, normalize=spec.normalize_sph)

    onehot_local = jax.nn.one_hot(dd["species"], spec.num_species, dtype=dtype)

    x = linear_apply(spec.embed_linear, params["onehot_to_feature_x"], onehot_local)
    for layer in spec.layers:
        t = layer.t
        if layer.sc_type == "nequip":
            sc = fctp_apply(
                layer.sc_fctp, params[f"{t}_self_connection_intro"], x, onehot_local
            )
        elif layer.sc_type == "linear":
            sc = linear_apply(layer.sc_linear, params[f"{t}_self_connection_intro"], x)
        else:
            sc = None
        x1 = linear_apply(layer.si1, params[f"{t}_self_interaction_1"], x)
        x_ext = jnp.concatenate([x1, _exchange(x1, dd)], axis=0)
        w = scalar_mlp_apply(
            layer.radial_mlp, params[f"{t}_convolution"]["weight_nn"], edge_emb
        )
        msg = conv_tp_apply(layer.conv, x_ext[dd["edge_src"]], sh, w)
        xc = jax.ops.segment_sum(msg, dd["edge_dst"], num_segments=n_cap)
        xc = xc / params[f"{t}_convolution"]["denominator"][0]
        xc = linear_apply(layer.si2, params[f"{t}_self_interaction_2"], xc)
        if sc is not None:
            xc = xc + sc
        x = gate_apply(layer.gate, xc)

    if spec.readout_as_fcn:
        e_scaled = scalar_mlp_apply(spec.readout_fcn, params["readout_FCN"], x)
    else:
        h = linear_apply(spec.readout1, params["reduce_input_to_hidden"], x)
        e_scaled = linear_apply(spec.readout2, params["reduce_hidden_to_energy"], h)
    e_scaled = e_scaled[:, 0]
    rs = params["rescale_atomic_energy"]
    if spec.rescale_mode == "species":
        shift = rs["shift"][dd["species"]]
        scale = rs["scale"][dd["species"]]
    else:
        shift = rs["shift"][0]
        scale = rs["scale"][0]
    return (e_scaled * scale + shift) * atom_mask


def dd_to_device_arrays(dd) -> Dict[str, np.ndarray]:
    """DomainDecomposition -> dict of stacked per-device arrays, with ghost
    species precomputed host-side (species are static; only features and
    positions are exchanged at runtime)."""
    D = dd.n_devices
    gl = dd.n_ghost_left_cap
    ghost_species = np.zeros((D, dd.n_ghost_cap), np.int32)
    for d in range(D):
        left_src = (d - 1) % D
        right_src = (d + 1) % D
        ls = dd.species[left_src][dd.send_idx_right[left_src]]
        ls = np.where(dd.send_mask_right[left_src], ls, 0)
        rs = dd.species[right_src][dd.send_idx_left[right_src]]
        rs = np.where(dd.send_mask_left[right_src], rs, 0)
        ghost_species[d, : len(ls)] = ls
        ghost_species[d, gl : gl + len(rs)] = rs
    return {
        "positions": dd.positions.astype(np.float32),
        "species": dd.species,
        "atom_mask": dd.atom_mask,
        "send_idx_left": dd.send_idx_left,
        "send_mask_left": dd.send_mask_left,
        "send_idx_right": dd.send_idx_right,
        "send_mask_right": dd.send_mask_right,
        "ghost_shift": dd.ghost_shift.astype(np.float32),
        "ghost_mask": dd.ghost_mask,
        "ghost_species": ghost_species,
        "edge_src": dd.edge_src,
        "edge_dst": dd.edge_dst,
        "edge_shift": dd.edge_shift.astype(np.float32),
        "edge_mask": dd.edge_mask,
    }


def make_distributed_compute(spec: ModelSpec, mesh: Mesh):
    """Returns jitted fn(params, dd_arrays, cell) ->
    {energy (), atomic_energy (D, N_cap), forces (D, N_cap, 3), stress (6,)}.
    """
    from jax import shard_map

    def fn(params, dd_arrays, cell):
        sm = shard_map(
            lambda params, dd_stack, cell, pos, eps: _local_atomic_energy(
                spec,
                params,
                jax.tree.map(lambda x: x[0], dd_stack),
                cell,
                pos[0],
                eps,
            )[None],
            mesh=mesh,
            in_specs=(P(), P("dd"), P(), P("dd"), P()),
            out_specs=P("dd"),
            check_vma=False,
        )

        def etot(pos, eps):
            e_atoms = sm(params, dd_arrays, cell, pos, eps)
            return jnp.sum(e_atoms), e_atoms

        eps0 = jnp.zeros((3, 3), dd_arrays["positions"].dtype)
        (e, e_atoms), (g_pos, g_eps) = jax.value_and_grad(
            etot, argnums=(0, 1), has_aux=True
        )(dd_arrays["positions"], eps0)
        forces = -g_pos * dd_arrays["atom_mask"][..., None].astype(g_pos.dtype)
        volume = jnp.abs(jnp.linalg.det(cell))
        # g_eps[b,a] = sum_e r_b f_a ; model stress order (xx,yy,zz,xy,yz,zx)
        stress = (
            -jnp.stack(
                [
                    g_eps[0, 0], g_eps[1, 1], g_eps[2, 2],
                    g_eps[0, 1], g_eps[1, 2], g_eps[2, 0],
                ]
            )
            / volume
        )
        return {
            "energy": e,
            "atomic_energy": e_atoms,
            "forces": forces,
            "stress": stress,
        }

    return jax.jit(fn)


def distributed_compute(spec: ModelSpec, params, dd, mesh: Mesh):
    """Convenience wrapper: partition -> device arrays -> compute."""
    arrays = dd_to_device_arrays(dd)
    cell = jnp.asarray(dd.cell, dtype=jnp.float32)
    fn = make_distributed_compute(spec, mesh)
    return fn(params, arrays, cell)
