"""Functional model: parameter init + forward (energy) + derivatives.

The TPU-native redesign of the reference's ``AtomGraphSequential`` pipeline
(``sevenn/nn/sequential.py``): a pure function over a padded
:class:`~sevennet_tpu.data.graph.GraphBatch`. Forces and stress come from
``jax.grad`` of the total energy with respect to *edge vectors*, mirroring
``ForceStressOutputFromEdge`` (``sevenn/nn/force_output.py:139-230``) — the
formulation that keeps the physics local per domain and thus compatible with
spatial decomposition across a TPU mesh.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import GraphBatch
from ..ops.gate import gate_apply
from ..ops.linear import linear_apply, linear_init
from ..ops.mlp import scalar_mlp_apply, scalar_mlp_init
from ..ops.radial import bessel_basis, bessel_coeffs_init, poly_cutoff, xplor_cutoff
from ..ops.tensor_product import conv_tp_apply, fctp_apply, fctp_init
from ..so3.spherical import spherical_harmonics
from .build import ModelSpec

__all__ = ["model_init", "model_energy", "model_compute", "SevenNetTPU"]


def model_init(key, spec: ModelSpec, dtype=jnp.float32) -> Dict[str, Any]:
    """Initialize a parameter pytree keyed by reference layer names."""
    params: Dict[str, Any] = {}
    keys = iter(jax.random.split(key, 8 + 8 * len(spec.layers)))
    params["edge_embedding"] = {
        "bessel_coeffs": jnp.asarray(
            bessel_coeffs_init(spec.cutoff, spec.radial_basis_num), dtype
        )
    }
    params["onehot_to_feature_x"] = linear_init(next(keys), spec.embed_linear, dtype)
    for layer in spec.layers:
        t = layer.t
        if layer.sc_type == "nequip":
            params[f"{t}_self_connection_intro"] = fctp_init(
                next(keys), layer.sc_fctp, dtype
            )
        elif layer.sc_type == "linear":
            params[f"{t}_self_connection_intro"] = linear_init(
                next(keys), layer.sc_linear, dtype
            )
        params[f"{t}_self_interaction_1"] = linear_init(next(keys), layer.si1, dtype)
        params[f"{t}_convolution"] = {
            "weight_nn": scalar_mlp_init(next(keys), layer.radial_mlp, dtype),
            "denominator": jnp.asarray([layer.denominator_init], dtype),
        }
        params[f"{t}_self_interaction_2"] = linear_init(next(keys), layer.si2, dtype)
    if spec.readout_as_fcn:
        params["readout_FCN"] = scalar_mlp_init(next(keys), spec.readout_fcn, dtype)
    else:
        params["reduce_input_to_hidden"] = linear_init(next(keys), spec.readout1, dtype)
        params["reduce_hidden_to_energy"] = linear_init(next(keys), spec.readout2, dtype)
    params["rescale_atomic_energy"] = {
        "shift": jnp.asarray(spec.shift_init, dtype),
        "scale": jnp.asarray(spec.scale_init, dtype),
    }
    return params


def _vec_mode(spec) -> bool:
    """Vec-mode fused conv (round 4): pass raw edge vectors to the Pallas
    kernels and compute the Bessel basis / envelope / spherical harmonics
    in-kernel — eliminates the (N*K, n_basis)/(N*K, dim_f) HBM arrays whose
    minor dims pad to 128 lanes. Requires normalized spherical harmonics
    (the reference default). ``SEVENNET_TPU_VEC=0`` falls back to the
    emb/sh kernels."""
    import os

    if not (spec.conv_fused and spec.normalize_sph):
        return False
    return bool(int(os.environ.get("SEVENNET_TPU_VEC", 1)))


def _edge_embed_spec(spec, layer):
    from ..ops.fused_conv import EdgeEmbedSpec

    kind, arg = spec.cutoff_fn
    return EdgeEmbedSpec(
        n_basis=layer.radial_mlp.dims[0],
        cutoff=float(spec.cutoff),
        cutoff_kind=str(kind),
        cutoff_arg=float(arg),
        lmax=int(spec.lmax_edge),
    )


def _convolve_dense(spec, layer, conv_params, x, edge_emb, sh, edge_src,
                    n_atoms, edge_mir=None):
    """Dense-neighbor convolution: edge arrays are (N*K,) row-major by
    receiver. The scatter is a sum over the K axis fused into the
    tensor-product contraction — no segment_sum, no (E, dim_mid) buffer.

    In vec mode (``_vec_mode``) the ``edge_emb``/``sh`` slots instead carry
    the (3, N*K) row-major edge vectors and the (n_basis, 1) Bessel
    coefficient column (see :func:`model_energy`).

    With ``spec.conv_custom_vjp`` the fused implementation with the
    mirror-edge backward (``ops/dense_conv.py``) is used — the production
    path; the inline implementation below is the plain-autodiff reference.
    """
    from ..so3.wigner import real_wigner_3j

    K = spec.edge_dense_k
    conv = layer.conv

    if spec.conv_fused:
        from ..ops.fused_conv import chunk_threshold, fused_conv_apply

        assert edge_mir is not None, (
            "spec.conv_fused requires graph.edge_mir (mirror_map)"
        )
        row_chunk = (
            (spec.edge_chunk // K)
            if spec.edge_chunk
            and n_atoms * K * conv.irreps_x.dim * 4 > chunk_threshold()
            else 0
        )
        if _vec_mode(spec):
            # vec mode: ``edge_emb`` carries the (3, N*K) row-major edge
            # vectors, ``sh`` the (n_basis, 1) Bessel coefficient column;
            # basis/envelope/spherical harmonics run in-kernel.
            from ..ops.fused_conv import fused_conv_apply_vec

            return fused_conv_apply_vec(
                conv,
                layer.radial_mlp,
                conv_params["weight_nn"],
                sh,
                _edge_embed_spec(spec, layer),
                x,
                edge_emb,
                edge_src.reshape(n_atoms, K),
                edge_mir.reshape(n_atoms, K),
                param_grads=spec.conv_param_grads,
                row_chunk=row_chunk,
                ring=spec.conv_ring,
            )
        return fused_conv_apply(
            conv,
            layer.radial_mlp,
            conv_params["weight_nn"],
            x,
            edge_emb.reshape(n_atoms, K, -1),
            sh.reshape(n_atoms, K, -1),
            edge_src.reshape(n_atoms, K),
            edge_mir.reshape(n_atoms, K),
            param_grads=spec.conv_param_grads,
            # memory-bounded streaming only when the gathered (N*K, dim_x)
            # edge tensor would be too big to materialize (100k-atom scale);
            # below that the unchunked mirror backward is faster
            row_chunk=row_chunk,
            ring=spec.conv_ring,
        )

    if spec.conv_custom_vjp:
        from ..ops.dense_conv import dense_conv_apply

        chunk = spec.edge_chunk
        block_atoms = max(chunk // K, 1) if chunk > 0 else 0
        return dense_conv_apply(
            conv,
            layer.radial_mlp,
            conv_params["weight_nn"],
            x,
            edge_emb.reshape(n_atoms, K, -1),
            sh.reshape(n_atoms, K, -1),
            edge_src.reshape(n_atoms, K),
            block_atoms=block_atoms,
            compute_dtype=jnp.dtype(spec.conv_dtype),
        )

    def block(emb_ak, sh_ak, src_ak):
        """Conv for a block of A atoms: (A, K, ...) -> (A, dim_mid).
        The radial MLP runs inside the block so its (A, K, numel) output
        never materializes for all atoms at once."""
        A = emb_ak.shape[0]
        w_ak = scalar_mlp_apply(layer.radial_mlp, conv_params["weight_nn"], emb_ak)
        xg = x[src_ak]  # (A, K, dim_x)
        xs = conv.irreps_x.slices()
        fs = conv.irreps_filter.slices()
        out = [None] * len(conv.irreps_mid)
        w_off = 0
        for i, j, k, pw in conv.instructions:
            mi_x = conv.irreps_x[i]
            mi_f = conv.irreps_filter[j]
            mi_o = conv.irreps_mid[k]
            w3j = jnp.asarray(
                real_wigner_3j(mi_x.ir.l, mi_f.ir.l, mi_o.ir.l), dtype=x.dtype
            )
            xb = xg[:, :, xs[i]].reshape(A, K, mi_x.ir.dim, mi_x.mul)
            fb = sh_ak[:, :, fs[j]]
            wb = w_ak[:, :, w_off : w_off + mi_x.mul]
            w_off += mi_x.mul
            tmp = jnp.einsum("mnp,akn->akmp", w3j, fb)
            xw = xb * (pw * wb)[:, :, None, :]
            # contract m AND K in one reduction — never materializes an
            # (A, K, p, u) tensor
            msg = jnp.einsum("akmp,akmu->apu", tmp, xw)
            out[k] = msg if out[k] is None else out[k] + msg

        pieces = []
        kk = 0
        nb = len(conv.irreps_mid)
        while kk < nb:
            ir = conv.irreps_mid[kk].ir
            group = []
            while kk < nb and conv.irreps_mid[kk].ir == ir:
                mi = conv.irreps_mid[kk]
                blk = out[kk]
                if blk is None:
                    blk = jnp.zeros((A, mi.ir.dim, mi.mul), dtype=x.dtype)
                group.append(blk)
                kk += 1
            joined = group[0] if len(group) == 1 else jnp.concatenate(group, -1)
            pieces.append(joined.reshape(A, -1))
        return jnp.concatenate(pieces, axis=-1)

    emb_nk = edge_emb.reshape(n_atoms, K, -1)
    sh_nk = sh.reshape(n_atoms, K, -1)
    src_nk = edge_src.reshape(n_atoms, K)

    chunk = spec.edge_chunk
    a_blk = max(chunk // K, 1) if chunk > 0 else 0
    if a_blk <= 0 or n_atoms <= a_blk:
        return block(emb_nk, sh_nk, src_nk)

    # stream atom blocks through a scan (memory bounded per block); pad the
    # atom axis so it divides evenly — padded rows gather atom 0 and their
    # outputs are sliced away
    pad = (-n_atoms) % a_blk
    if pad:
        emb_nk = jnp.concatenate(
            [emb_nk, jnp.zeros((pad,) + emb_nk.shape[1:], emb_nk.dtype)]
        )
        sh_nk = jnp.concatenate(
            [sh_nk, jnp.zeros((pad,) + sh_nk.shape[1:], sh_nk.dtype)]
        )
        src_nk = jnp.concatenate(
            [src_nk, jnp.zeros((pad, K), src_nk.dtype)]
        )
    nblk = (n_atoms + pad) // a_blk

    # remat the block: the scan otherwise stacks every block's TP
    # intermediates as backward residuals, defeating the streaming
    block_r = jax.checkpoint(block)

    def body(_, inp):
        e, s, sr = inp
        return None, block_r(e, s, sr)

    _, ys = jax.lax.scan(
        body,
        None,
        (
            emb_nk.reshape(nblk, a_blk, K, -1),
            sh_nk.reshape(nblk, a_blk, K, -1),
            src_nk.reshape(nblk, a_blk, K),
        ),
    )
    return ys.reshape(nblk * a_blk, -1)[:n_atoms]


def _convolve(spec, layer, conv_params, x, edge_emb, sh, edge_src, edge_dst,
              n_atoms, edge_mir=None):
    """Radial-MLP-weighted uvu TP + scatter into nodes.

    With ``spec.edge_chunk`` set, edges stream through in fixed-size chunks
    (lax.scan) so the per-edge message buffer is bounded — the HBM-frugal
    path for large systems on a 16 GB chip.
    """

    if spec.edge_dense_k > 0:
        assert edge_emb.shape[0] == n_atoms * spec.edge_dense_k or (
            _vec_mode(spec) and edge_emb.shape == (3, n_atoms * spec.edge_dense_k)
        ), (
            "dense conv requires edges in (N_cap, K) row-major-by-receiver "
            "layout (the MD cell-list layout)"
        )
        return _convolve_dense(
            spec, layer, conv_params, x, edge_emb, sh, edge_src, n_atoms,
            edge_mir,
        )

    def block(emb_c, sh_c, src_c, dst_c, sorted_dst):
        w = scalar_mlp_apply(layer.radial_mlp, conv_params["weight_nn"], emb_c)
        msg = conv_tp_apply(layer.conv, x[src_c], sh_c, w)
        return jax.ops.segment_sum(
            msg, dst_c, num_segments=n_atoms, indices_are_sorted=sorted_dst
        )

    E = edge_emb.shape[0]
    chunk = spec.edge_chunk
    if chunk <= 0 or E <= chunk:
        return block(edge_emb, sh, edge_src, edge_dst, True)

    if E % chunk != 0:
        # zero-pad: the radial MLP has no biases, so zero edge embeddings
        # produce exactly zero messages scattered into atom 0
        pad = chunk - E % chunk
        edge_emb = jnp.concatenate(
            [edge_emb, jnp.zeros((pad, edge_emb.shape[1]), edge_emb.dtype)]
        )
        sh = jnp.concatenate([sh, jnp.zeros((pad, sh.shape[1]), sh.dtype)])
        edge_src = jnp.concatenate([edge_src, jnp.zeros(pad, edge_src.dtype)])
        edge_dst = jnp.concatenate(
            [edge_dst, jnp.full(pad, n_atoms - 1, edge_dst.dtype)]
        )
        E = E + pad

    n_chunks = E // chunk
    emb_s = edge_emb.reshape(n_chunks, chunk, -1)
    sh_s = sh.reshape(n_chunks, chunk, -1)
    src_s = edge_src.reshape(n_chunks, chunk)
    dst_s = edge_dst.reshape(n_chunks, chunk)

    def body(acc, inp):
        emb_c, sh_c, src_c, dst_c = inp
        return acc + block(emb_c, sh_c, src_c, dst_c, True), None

    init = jnp.zeros((n_atoms, layer.conv.irreps_mid.dim), dtype=x.dtype)
    acc, _ = jax.lax.scan(body, init, (emb_s, sh_s, src_s, dst_s))
    return acc


def _cutoff_envelope(spec: ModelSpec, r):
    kind, arg = spec.cutoff_fn
    if kind == "poly_cut":
        return poly_cutoff(r, spec.cutoff, p=int(arg))
    return xplor_cutoff(r, spec.cutoff, arg)


def model_energy(
    spec: ModelSpec,
    params: Dict[str, Any],
    graph: GraphBatch,
    edge_vec: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Pure energy evaluation given explicit edge vectors.

    Returns per-atom energies (masked) and per-graph total energies.
    """
    dtype = edge_vec.dtype
    atom_mask = graph.atom_mask.astype(dtype)
    edge_mask = graph.edge_mask.astype(dtype)
    n_edges = graph.edge_mask.shape[0]
    # edge vectors may come TRANSPOSED as (3, E): every (E, 3)-shaped op
    # pads its minor dim to the 128-lane tile on TPU, so the production
    # vec-mode force path keeps vectors (and their cotangents) in 3-row
    # layout end-to-end (see model_compute)
    transposed = edge_vec.ndim == 2 and edge_vec.shape == (3, n_edges)

    # guard padded edges: replace with a sentinel vector BEYOND the cutoff
    # so norms/grads are finite and the clamped envelope zeroes them (the
    # vec-mode kernels rely on this; the XLA path additionally masks)
    fallback = jnp.array([2.0 * spec.cutoff, 0.0, 0.0], dtype=dtype)
    if transposed:
        ev3 = jnp.where(
            graph.edge_mask[None, :], edge_vec, fallback[:, None]
        )
    else:
        ev = jnp.where(graph.edge_mask[:, None], edge_vec, fallback)

    if spec.edge_dense_k > 0 and _vec_mode(spec):
        # vec-mode fused conv: no (E, n_basis)/(E, dim_f) arrays — ship the
        # k-major (3, E) edge vectors + Bessel coefficient column instead;
        # the kernels do basis/envelope/spherical harmonics themselves
        edge_emb = ev3 if transposed else ev.T
        sh = params["edge_embedding"]["bessel_coeffs"][:, None]
    else:
        if transposed:
            ev = ev3.T
        r = jnp.linalg.norm(ev, axis=-1)
        basis = bessel_basis(
            r, params["edge_embedding"]["bessel_coeffs"], spec.cutoff
        )
        env = _cutoff_envelope(spec, r)
        edge_emb = basis * (env * edge_mask)[:, None]  # zero on padding
        sh = spherical_harmonics(
            spec.lmax_edge, ev, normalize=spec.normalize_sph
        )

    onehot = jax.nn.one_hot(graph.species, spec.num_species, dtype=dtype)

    # multi-fidelity: per-atom modality one-hot appended to selected linears
    if spec.num_modalities > 1:
        if spec.pinned_modal >= 0:
            # deploy-time pin (select_modality): ignore graph.modal
            modal = jnp.full(graph.n_graphs_cap, spec.pinned_modal, jnp.int32)
        elif graph.modal is not None:
            modal = graph.modal
        else:
            modal = jnp.zeros(graph.n_graphs_cap, jnp.int32)
        modal_oh = jax.nn.one_hot(modal, spec.num_modalities, dtype=dtype)[
            graph.batch
        ]

        def with_modal(name, v):
            if name in spec.modal_linears:
                return jnp.concatenate([v, modal_oh], axis=-1)
            return v
    else:
        def with_modal(name, v):
            return v

    x = linear_apply(
        spec.embed_linear,
        params["onehot_to_feature_x"],
        with_modal("onehot_to_feature_x", onehot),
    )

    n_atoms = graph.n_atoms_cap
    for layer in spec.layers:
        t = layer.t
        layer_params = {
            k: params[k]
            for k in (
                f"{t}_self_connection_intro",
                f"{t}_self_interaction_1",
                f"{t}_convolution",
                f"{t}_self_interaction_2",
            )
            if k in params
        }

        def layer_fn(lp, x, onehot, edge_emb, sh, layer=layer, t=t):
            if layer.sc_type == "nequip":
                sc = fctp_apply(
                    layer.sc_fctp, lp[f"{t}_self_connection_intro"], x, onehot
                )
            elif layer.sc_type == "linear":
                sc = linear_apply(
                    layer.sc_linear, lp[f"{t}_self_connection_intro"], x
                )
            else:
                sc = None
            x = linear_apply(
                layer.si1,
                lp[f"{t}_self_interaction_1"],
                with_modal(f"{t}_self_interaction_1", x),
            )
            x = _convolve(
                spec, layer, lp[f"{t}_convolution"], x, edge_emb, sh,
                graph.edge_src, graph.edge_dst, n_atoms, graph.edge_mir,
            )
            x = x / lp[f"{t}_convolution"]["denominator"][0]
            x = linear_apply(
                layer.si2,
                lp[f"{t}_self_interaction_2"],
                with_modal(f"{t}_self_interaction_2", x),
            )
            if sc is not None:
                x = x + sc
            return gate_apply(layer.gate, x)

        if spec.remat_layers:
            layer_fn = jax.checkpoint(layer_fn)
        x = layer_fn(layer_params, x, onehot, edge_emb, sh)

    if spec.readout_as_fcn:
        e_scaled = scalar_mlp_apply(spec.readout_fcn, params["readout_FCN"], x)
    else:
        h = linear_apply(
            spec.readout1,
            params["reduce_input_to_hidden"],
            with_modal("reduce_input_to_hidden", x),
        )
        e_scaled = linear_apply(spec.readout2, params["reduce_hidden_to_energy"], h)
    e_scaled = e_scaled[:, 0]  # (N,)

    rs = params["rescale_atomic_energy"]
    if spec.rescale_mode == "modal":
        if spec.pinned_modal >= 0:
            modal_g = jnp.full(graph.n_graphs_cap, spec.pinned_modal, jnp.int32)
        elif graph.modal is not None:
            modal_g = graph.modal
        else:
            modal_g = jnp.zeros(graph.n_graphs_cap, jnp.int32)
        modal_idx = modal_g[graph.batch]
        shift = (
            rs["shift"][modal_idx, graph.species]
            if spec.use_modal_wise_shift
            else rs["shift"][graph.species]
        )
        scale = (
            rs["scale"][modal_idx, graph.species]
            if spec.use_modal_wise_scale
            else rs["scale"][graph.species]
        )
    elif spec.rescale_mode == "species":
        shift = rs["shift"][graph.species]
        scale = rs["scale"][graph.species]
    else:
        shift = rs["shift"][0]
        scale = rs["scale"][0]
    e_atom = (e_scaled * scale + shift) * atom_mask

    e_graph = jax.ops.segment_sum(
        e_atom, graph.batch, num_segments=graph.n_graphs_cap
    )
    e_graph = e_graph * graph.graph_mask.astype(dtype)
    return {"atomic_energy": e_atom, "energy": e_graph}


def model_compute(
    spec: ModelSpec,
    params: Dict[str, Any],
    graph: GraphBatch,
    compute_stress: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Energy, forces and stress.

    Forces: ``F_i = sum_{e: dst=i} f_e - sum_{e: src=i} f_e`` with
    ``f_e = dE/d(edge_vec_e)``; per-atom virial scattered at the sender and
    stress ``-sum virial / V`` in Voigt order (xx,yy,zz,xy,yz,zx) — exactly
    the reference ``ForceStressOutputFromEdge`` (``force_output.py:171-230``).
    """
    n = graph.n_atoms_cap
    K = spec.edge_dense_k
    if K > 0 and _vec_mode(spec) and graph.edge_mir is not None:
        # transposed force path: every (E, 3)-shaped tensor pads its minor
        # dim to the 128-lane tile on TPU (~42x traffic waste), so keep the
        # edge vectors, their cotangents, and the whole force/virial
        # assembly in 3-row (3, E) layout. The src-side sums use the
        # mirror permutation (edges with src=i are exactly the mirrors of
        # receiver-row i) instead of a segment_sum scatter.
        ev3 = graph.edge_vectors().T  # one transpose; not in the grad path

        def etot3(ev3):
            out = model_energy(spec, params, graph, ev3)
            return jnp.sum(out["energy"]), out

        (_, out), fij3 = jax.value_and_grad(etot3, has_aux=True)(ev3)
        mir = graph.edge_mir
        pf3 = fij3.reshape(3, n, K).sum(2)
        nf3 = fij3[:, mir].reshape(3, n, K).sum(2)
        am = graph.atom_mask.astype(fij3.dtype)
        out["forces"] = ((pf3 - nf3) * am[None, :]).T

        if compute_stress:
            r0, r1, r2 = ev3[0], ev3[1], ev3[2]
            f0, f1, f2 = fij3[0], fij3[1], fij3[2]
            v6 = jnp.stack(
                [r0 * f0, r1 * f1, r2 * f2, r0 * f1, r1 * f2, r2 * f0]
            )  # (6, E), reference Voigt order (xx,yy,zz,xy,yz,zx)
            # per-atom virial at the SENDER (reference
            # force_output.py:197-228): src-side sum via the mirror rows
            av6 = -v6[:, mir].reshape(6, n, K).sum(2)       # (6, N)
            atomic_virial = av6.T
            virial_graph = jax.ops.segment_sum(
                atomic_virial, graph.batch, num_segments=graph.n_graphs_cap
            )
            out["atomic_virial"] = atomic_virial
            out["stress"] = virial_graph / graph.volume[:, None]
        return out

    edge_vec = graph.edge_vectors()

    def etot(ev):
        out = model_energy(spec, params, graph, ev)
        return jnp.sum(out["energy"]), out

    (_, out), fij = jax.value_and_grad(etot, has_aux=True)(edge_vec)

    pf = jax.ops.segment_sum(fij, graph.edge_dst, num_segments=n)
    nf = jax.ops.segment_sum(fij, graph.edge_src, num_segments=n)
    forces = (pf - nf) * graph.atom_mask.astype(fij.dtype)[:, None]
    out["forces"] = forces

    if compute_stress:
        rij = edge_vec
        diag = rij * fij
        v6 = jnp.concatenate(
            [
                diag,
                (rij[:, 0] * fij[:, 1])[:, None],
                (rij[:, 1] * fij[:, 2])[:, None],
                (rij[:, 2] * fij[:, 0])[:, None],
            ],
            axis=-1,
        )
        atomic_virial = -jax.ops.segment_sum(
            v6, graph.edge_src, num_segments=n
        )
        virial_graph = jax.ops.segment_sum(
            atomic_virial, graph.batch, num_segments=graph.n_graphs_cap
        )
        out["atomic_virial"] = atomic_virial
        out["stress"] = virial_graph / graph.volume[:, None]
    return out


class SevenNetTPU:
    """Convenience wrapper bundling a spec with jitted entry points."""

    def __init__(self, spec: ModelSpec):
        self.spec = spec
        self._compute = jax.jit(
            lambda params, graph: model_compute(spec, params, graph)
        )

    def init(self, key=None, dtype=jnp.float32):
        if key is None:
            key = jax.random.PRNGKey(0)
        return model_init(key, self.spec, dtype)

    def __call__(self, params, graph: GraphBatch):
        return self._compute(params, graph)

    @property
    def z_to_type(self) -> np.ndarray:
        return self.spec.z_to_type
