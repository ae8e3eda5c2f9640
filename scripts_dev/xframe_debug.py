"""Stage-by-stage diff between the torch fp64 evaluator and the JAX fp64
forward on cp_0 + the HfO2 fixture."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import torch
import math

from sevennet_tpu.io import load_sevennet_checkpoint
from sevennet_tpu.ops.linear import linear_apply
from sevennet_tpu.ops.tensor_product import fctp_apply, conv_tp_apply
from sevennet_tpu.ops.mlp import scalar_mlp_apply
from sevennet_tpu.ops.radial import bessel_basis, poly_cutoff
from sevennet_tpu.ops.gate import gate_apply
from sevennet_tpu.so3.spherical import spherical_harmonics

CP = "/root/reference/tests/data/checkpoints/cp_0.pth"
spec, params = load_sevennet_checkpoint(CP)
params = jax.tree.map(lambda a: a.astype(jnp.float64), params)

rng = np.random.default_rng(42)
a = 5.1
cell = np.eye(3) * a
frac = np.array([[0,0,0],[0.5,0.5,0],[0.5,0,0.5],[0,0.5,0.5],
 [0.25,0.25,0.25],[0.75,0.75,0.25],[0.75,0.25,0.75],[0.25,0.75,0.75],
 [0.75,0.75,0.75],[0.25,0.25,0.75],[0.25,0.75,0.25],[0.75,0.25,0.25]])
pos = frac @ cell + rng.normal(scale=0.05, size=(12,3))
Z = np.array([72]*4 + [8]*8)

from sevennet_tpu.data.neighborlist import neighbor_list_numpy
dst, src, shifts = neighbor_list_numpy(pos, spec.cutoff, cell, True)
n_atoms = 12

# ---------------- torch side, instrumented ----------------
sys.path.insert(0, "/root/repo/tests")
import torch_eval as TE

cp = torch.load(CP, map_location="cpu", weights_only=False)
sd = cp["model_state_dict"]; cfg = cp["config"]
w3j = TE.W3J(sd)
pos_t = torch.as_tensor(pos, dtype=torch.float64)
cell_t = torch.as_tensor(cell, dtype=torch.float64)
edge_vec_t = pos_t[torch.as_tensor(src)] - pos_t[torch.as_tensor(dst)] + \
    torch.as_tensor(np.asarray(shifts), dtype=torch.float64) @ cell_t
r_t = edge_vec_t.norm(dim=-1)
coeffs = sd["edge_embedding.basis_function.coeffs"].to(torch.float64)
emb_t = TE.bessel(r_t, coeffs, spec.cutoff) * TE.poly_cutoff(r_t, spec.cutoff).unsqueeze(-1)
sh_t = TE.sph_harm(2, edge_vec_t)
types = torch.as_tensor(spec.z_to_type[Z], dtype=torch.long)
onehot_t = torch.nn.functional.one_hot(types, 2).to(torch.float64)

plan = {"embed_out": str(spec.embed_linear.irreps_out),
        "readout_hidden": str(spec.readout1.irreps_out),
        "layers": [{"x": str(L.si1.irreps_in), "filter": str(L.conv.irreps_filter),
                    "target": str(L.conv.irreps_out_target),
                    "gate_in": str(L.si2.irreps_out), "out": str(L.gate.irreps_out)}
                   for L in spec.layers]}

embed_t = TE.Linear("2x0e", plan["embed_out"], sd["onehot_to_feature_x.linear.weight"])
x_t = embed_t(onehot_t)

# ---------------- jax side ----------------
ev_j = jnp.asarray(edge_vec_t.numpy())
r_j = jnp.linalg.norm(ev_j, axis=-1)
emb_j = bessel_basis(r_j, params["edge_embedding"]["bessel_coeffs"], spec.cutoff) \
    * poly_cutoff(r_j, spec.cutoff)[:, None]
sh_j = spherical_harmonics(2, ev_j, normalize=True)
onehot_j = jax.nn.one_hot(jnp.asarray(spec.z_to_type[Z]), 2, dtype=jnp.float64)
x_j = linear_apply(spec.embed_linear, params["onehot_to_feature_x"], onehot_j)


def mul_ir_to_ir_mul(arr_t, irreps):
    """torch mul_ir flat -> ir_mul flat (numpy) for comparison."""
    import re
    out = []
    off = 0
    for tok in str(irreps).split("+"):
        mul, ir = tok.split("x")
        mul = int(mul); l = int(ir[:-1]); d = 2*l+1
        blk = arr_t[:, off:off+mul*d].reshape(-1, mul, d)
        out.append(np.transpose(blk, (0, 2, 1)).reshape(-1, mul*d))
        off += mul*d
    return np.concatenate(out, -1)


def diff(name, t_arr, j_arr, irreps=None):
    tn = t_arr.detach().numpy() if isinstance(t_arr, torch.Tensor) else np.asarray(t_arr)
    if irreps is not None:
        tn = mul_ir_to_ir_mul(tn, irreps)
    jn = np.asarray(j_arr)
    print(f"{name:28s} max|diff| {np.abs(tn - jn).max():.3e}  scale {np.abs(jn).max():.3e}")


diff("emb", emb_t, emb_j)
diff("sh", sh_t, sh_j)
diff("x embed", x_t, x_j, plan["embed_out"])

src_j = jnp.asarray(src); dst_j = jnp.asarray(dst)
src_t_t = torch.as_tensor(src); dst_t_t = torch.as_tensor(dst)

for t, (L, lp) in enumerate(zip(spec.layers, plan["layers"])):
    sc_t = TE.FCTP(lp["x"], "2x0e", lp["gate_in"],
                   sd[f"{t}_self_connection_intro.fc_tensor_product.weight"], w3j)
    sco_t = sc_t(x_t, onehot_t)
    sco_j = fctp_apply(L.sc_fctp, params[f"{t}_self_connection_intro"], x_j, onehot_j)
    diff(f"L{t} sc", sco_t, sco_j, lp["gate_in"])

    si1_t = TE.Linear(lp["x"], lp["x"], sd[f"{t}_self_interaction_1.linear.weight"])
    x_t = si1_t(x_t)
    x_j = linear_apply(L.si1, params[f"{t}_self_interaction_1"], x_j)
    diff(f"L{t} si1", x_t, x_j, lp["x"])

    conv_t = TE.ConvTP(lp["x"], lp["filter"], lp["target"], w3j)
    mlp_ws = [sd[f"{t}_convolution.weight_nn.layer{i}.weight"] for i in range(3)]
    w_t = TE.weight_nn(emb_t, mlp_ws, "silu")
    w_j = scalar_mlp_apply(L.radial_mlp, params[f"{t}_convolution"]["weight_nn"], emb_j)
    diff(f"L{t} radial w", w_t, w_j)

    msg_t = conv_t(x_t[src_t_t], sh_t, w_t)
    xn_t = torch.zeros(n_atoms, msg_t.shape[1], dtype=torch.float64).index_add_(0, dst_t_t, msg_t)
    denom = sd[f"{t}_convolution.denominator"].to(torch.float64)
    x_t = xn_t / denom

    msg_j = conv_tp_apply(L.conv, x_j[src_j], sh_j, w_j)
    xn_j = jax.ops.segment_sum(msg_j, dst_j, num_segments=n_atoms)
    x_j = xn_j / params[f"{t}_convolution"]["denominator"][0]
    diff(f"L{t} conv/denom", x_t, x_j, str(L.conv.irreps_mid.simplify()) if hasattr(L.conv.irreps_mid, "simplify") else None)

    si2_t = TE.Linear(conv_t.irreps_mid_str, lp["gate_in"],
                      sd[f"{t}_self_interaction_2.linear.weight"])
    x_t = si2_t(x_t) + sco_t
    x_j = linear_apply(L.si2, params[f"{t}_self_interaction_2"], x_j) + sco_j
    diff(f"L{t} si2+sc", x_t, x_j, lp["gate_in"])

    x_t = TE.gate(x_t, lp["out"], cfg["act_scalar"], cfg["act_gate"])
    x_j = gate_apply(L.gate, x_j)
    diff(f"L{t} gate", x_t, x_j, lp["out"])

ro1_t = TE.Linear(plan["layers"][-1]["out"], plan["readout_hidden"],
                  sd["reduce_input_to_hidden.linear.weight"])
ro2_t = TE.Linear(plan["readout_hidden"], "1x0e", sd["reduce_hidden_to_energy.linear.weight"])
e_t = ro2_t(ro1_t(x_t))[:, 0]
h_j = linear_apply(spec.readout1, params["reduce_input_to_hidden"], x_j)
e_j = linear_apply(spec.readout2, params["reduce_hidden_to_energy"], h_j)[:, 0]
diff("atomic e (scaled)", e_t, e_j)
