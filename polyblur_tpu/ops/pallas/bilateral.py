"""Pallas TPU kernel for the 5x5 bilateral prefilter.

The bilateral filter (reference filters.py:107-148) is pure VPU work:
ksize^2 shifted reads, an exp, two multiply-accumulates per tap. The XLA
composition in ops/bilateral.py already fuses well, but on the prefiltering
hot path it still costs one HBM round-trip for the padded buffer; this
kernel keeps the whole plane VMEM-resident — one HBM read and one write per
(batch, channel) image plane, everything else on-chip. Same math as the
in-mega-kernel `_bilateral5` helper (ops/pallas/polyblur_fused.py), exposed
standalone so the scan-path pipeline (method='fft'/'direct') gets the fused
prefilter too.

Differentiable via custom_vjp: the backward pass replays the XLA
composition's VJP (Pallas kernels have no automatic transpose); forward
residual is just the input plane.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bilateral_pallas", "pallas_bilateral_eligible"]

# Largest image-plane edge kept VMEM-resident (~6 f32 plane buffers).
_MAX_EDGE = 640


def pallas_bilateral_eligible(h: int, w: int, backend: str | None = None,
                              interpret: bool = False) -> bool:
    if backend is None:
        backend = jax.default_backend()
    if backend != "tpu" and not interpret:
        return False
    return max(h, w) <= _MAX_EDGE


def _replicate_pad2d(x, pad: int):
    """Replicate-pad a (H, W) block by ``pad`` on every side, in VMEM."""
    h, w = x.shape
    top = jnp.broadcast_to(x[:1], (pad, w))
    bot = jnp.broadcast_to(x[-1:], (pad, w))
    x = jnp.concatenate([top, x, bot], axis=0)
    left = jnp.broadcast_to(x[:, :1], (h + 2 * pad, pad))
    right = jnp.broadcast_to(x[:, -1:], (h + 2 * pad, pad))
    return jnp.concatenate([left, x, right], axis=1)


def bilateral_block(x, ksize: int = 5, sigma_spatial: float = 5.0,
                    sigma_color: float = 0.1):
    """Bilateral filter of one (H, W) f32 VMEM block (ops/bilateral.py
    semantics: replicate pad, reference spatial grid, 1e-5 guard). Shared
    by this kernel and the mega kernel's in-kernel prefilter."""
    t = np.arange(-ksize // 2 + 1, ksize // 2 + 1)
    gw = np.exp(-(t[None, :] ** 2 + t[:, None] ** 2)
                / (2.0 * sigma_spatial * sigma_spatial))
    inv_var2 = 1.0 / (2.0 * sigma_color * sigma_color)
    h, w = x.shape
    padded = _replicate_pad2d(x, ksize // 2)
    num = jnp.zeros_like(x)
    den = jnp.zeros_like(x)
    for dy in range(ksize):
        for dx in range(ksize):
            shifted = padded[dy:dy + h, dx:dx + w]
            d = shifted - x
            f = jnp.exp(-d * d * inv_var2) * jnp.float32(gw[dy, dx])
            num = num + f * shifted
            den = den + f
    return num / (den + 1e-5)


def _make_kernel(ksize: int, sigma_spatial: float, sigma_color: float):
    def kernel(x_ref, out_ref):
        x = x_ref[0].astype(jnp.float32)
        out_ref[0] = bilateral_block(
            x, ksize, sigma_spatial, sigma_color).astype(out_ref.dtype)

    return kernel


def _call(img, ksize, sigma_spatial, sigma_color, interpret):
    b, c, h, w = img.shape
    x = img.reshape(b * c, h, w)
    out = pl.pallas_call(
        _make_kernel(ksize, sigma_spatial, sigma_color),
        grid=(b * c,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x)
    return out.reshape(b, c, h, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def bilateral_pallas(img: jnp.ndarray, ksize: int = 5,
                     sigma_spatial: float = 5.0, sigma_color: float = 0.1,
                     interpret: bool = False) -> jnp.ndarray:
    """5x5 (by default) bilateral filter, one VMEM-resident Pallas program
    per (B, C) plane. Same semantics as ops/bilateral.bilateral_filter."""
    return _call(img, ksize, sigma_spatial, sigma_color, interpret)


def _fwd(img, ksize, sigma_spatial, sigma_color, interpret):
    return _call(img, ksize, sigma_spatial, sigma_color, interpret), img


def _bwd(ksize, sigma_spatial, sigma_color, interpret, img, g):
    from ..bilateral import _bilateral_xla

    _, vjp = jax.vjp(
        lambda x: _bilateral_xla(x, ksize, sigma_spatial, sigma_color), img)
    return vjp(g)


bilateral_pallas.defvjp(_fwd, _bwd)
