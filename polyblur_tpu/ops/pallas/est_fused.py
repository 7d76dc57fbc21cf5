"""Fused Pallas reduction for blur estimation — the BASELINE north-star:
"blur_estimation's FFT-gradient directional statistics become a fused
Pallas reduction over image gradients".

Per tile, one VMEM-resident program computes:
    gray = mean_C(tile) -> min/max normalize -> spectral gradients
    (two MXU matmuls with the constant circulant derivative operators,
    ops/spectral_matmul.py) -> max_xy |cos(t) gx - sin(t) gy| for the
    n_angles+1 sampled directions
and writes only the (n_angles+1,) directional maxima — the full-image
gradient fields never touch HBM. The remaining estimation chain
(Keys interpolation over angles, argmin, affine model) is a few hundred
flops and stays in XLA (estimation.py).

Forward-only: the training path differentiates the XLA chain (the caller
wires a custom VJP; see estimation.gaussian_blur_estimation).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["directional_maxima_pallas"]


def _make_kernel(n_angles: int, csz: int):
    angles = [i * math.pi / n_angles for i in range(n_angles + 1)]

    def kernel(x_ref, dw_ref, dh_ref, out_ref):
        _, c, h, w = x_ref.shape
        x = x_ref[0].astype(jnp.float32)  # (C, H, W)
        gray = x[0]
        for ch in range(1, csz):
            gray = gray + x[ch]
        gray = gray * (1.0 / csz)

        vmin = jnp.min(gray)
        vmax = jnp.max(gray)
        g = jnp.clip((gray - vmin) / jnp.maximum(vmax - vmin, 1e-8),
                     0.0, 1.0)

        dw = dw_ref[...]  # (W, W) f32
        dh = dh_ref[...]  # (H, H) f32
        # gx[y, u] = sum_v g[y, v] Dw[u, v]  (Dw antisymmetric — keep exact
        # orientation by contracting the second index of Dw)
        # NOTE: Mosaic supports only DEFAULT/HIGHEST dot precision; HIGHEST
        # costs ~2 ms/iter here for no measurable quality change (mean
        # fast-vs-fft restoration delta +0.001 dB over a 7-kernel sweep on
        # hardware), so the fused path keeps MXU-native precision. The XLA
        # estimation path (fft/oracle methods) runs HIGHEST.
        gx = jax.lax.dot_general(
            g, dw, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        gy = jax.lax.dot(dh, g, preferred_element_type=jnp.float32)

        row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        acc = jnp.zeros((8, 128), jnp.float32)
        for k, t in enumerate(angles):
            m = jnp.max(jnp.abs(math.cos(t) * gx - math.sin(t) * gy))
            acc = jnp.where(row == k, m, acc)
        out_ref[0] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("n_angles", "interpret"))
def directional_maxima_pallas(img: jnp.ndarray, n_angles: int = 6,
                              interpret: bool = False) -> jnp.ndarray:
    """(B, C, H, W) [0,1] images -> (B, n_angles+1) directional gradient
    maxima of the min/max-normalized channel-mean, exactly matching the
    XLA chain normalize -> spectral_gradients -> compute_gradient_magnitudes
    (q=0, no saturation mask)."""
    from ..spectral_matmul import derivative_matrix

    b, c, h, w = img.shape
    dw = derivative_matrix(w, jnp.float32)
    dh = derivative_matrix(h, jnp.float32)
    n_out = n_angles + 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((w, w), lambda i: (0, 0)),
            pl.BlockSpec((h, h), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
    )
    out = pl.pallas_call(
        _make_kernel(n_angles, c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(img, dw, dh)
    return out[:, :n_out, 0]
