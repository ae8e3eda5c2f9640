from .activations import ACTIVATION, NORMALIZED_ACTIVATION, normalized_act
from .radial import bessel_basis, poly_cutoff, xplor_cutoff
from .linear import LinearSpec, linear_init, linear_apply
from .tensor_product import (
    ConvTPSpec,
    FCTPSpec,
    conv_tp_apply,
    conv_tp_weight_numel,
    fctp_apply,
    fctp_init,
)
from .gate import GateSpec, gate_apply
from .mlp import ScalarMLPSpec, scalar_mlp_init, scalar_mlp_apply
