"""Radial basis and cutoff envelopes.

Mirrors the reference's edge embedding math (``sevenn/nn/edge_embedding.py``):

- :func:`bessel_basis`   <-> ``BesselBasis`` (:81-103): 2/rc * sin(c_n r)/r
  with trainable coefficients c_n initialized to n*pi/rc;
- :func:`poly_cutoff`    <-> ``PolynomialCutoff`` (:106-132), p=6 default;
- :func:`xplor_cutoff`   <-> ``XPLORCutoff`` (:135-160).

All are pure JAX functions over arbitrary-shaped radius arrays.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

__all__ = ["bessel_coeffs_init", "bessel_basis", "poly_cutoff", "xplor_cutoff"]


def bessel_coeffs_init(cutoff: float, num_basis: int = 8) -> np.ndarray:
    return np.array([n * math.pi / cutoff for n in range(1, num_basis + 1)], dtype=np.float32)


def bessel_basis(r, coeffs, cutoff: float, eps: float = 1e-12):
    """(...,) -> (..., num_basis). ``coeffs`` is the (trainable) frequency
    vector; prefactor 2/cutoff as in the reference."""
    ur = r[..., None]
    safe = jnp.maximum(ur, eps)
    return (2.0 / cutoff) * jnp.sin(coeffs * safe) / safe


def poly_cutoff(r, cutoff: float, p: int = 6):
    """Smooth polynomial envelope, 1 at r=0, 0 at r=cutoff (arXiv:2003.03123).

    Clamped to exactly zero beyond the cutoff: MD cell lists carry
    skin-shell edges (r in (cutoff, cutoff+skin]) and the raw polynomial
    is nonzero there — without the clamp those edges leak unphysical
    weight into the convolution (host neighbor lists are built at the
    bare cutoff and never exposed this)."""
    x = r / cutoff
    c0 = (p + 1.0) * (p + 2.0) / 2.0
    c1 = p * (p + 2.0)
    c2 = p * (p + 1.0) / 2.0
    xp = x**p
    val = 1.0 - c0 * xp + c1 * xp * x - c2 * xp * x * x
    return jnp.where(x < 1.0, val, 0.0)


def xplor_cutoff(r, cutoff: float, cutoff_on: float):
    """HOOMD XPLOR smoothing: 1 below r_on, smooth to 0 at r_cut."""
    r_sq = r * r
    on_sq = cutoff_on * cutoff_on
    cut_sq = cutoff * cutoff
    smooth = (
        (cut_sq - r_sq) ** 2
        * (cut_sq + 2.0 * r_sq - 3.0 * on_sq)
        / (cut_sq - on_sq) ** 3
    )
    # clamp beyond the cutoff (see poly_cutoff: skin-shell edges)
    return jnp.where(
        r < cutoff_on, 1.0, jnp.where(r < cutoff, smooth, 0.0)
    )
