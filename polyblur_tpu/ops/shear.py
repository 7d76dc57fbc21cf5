"""Circular row shear: the TPU-native factor of oriented Gaussian filtering.

An anisotropic Gaussian kernel exp(-0.5 q(x, y)) with quadratic form
q = a x^2 + 2 b x y + c y^2 factors as

    q = a (x + (b/a) y)^2 + (c - b^2/a) y^2

so convolution with it is ``unshear . conv_y(sigma_y') . conv_x(sigma_x)
. shear`` with shear slope s = b/a — the same x-then-sheared-axis
decomposition as the reference's native oriented-convolution kernel
(/root/reference/polyblur/separable_convolution/separable_gaussian2d.cpp:91-183),
but with the per-pixel bilinear sampling loop replaced by a whole-image
shear transform so the two 1D convolutions become band-matrix matmuls on
the MXU (ops/sep_poly.py).

The shear shifts row y by d_y = s * (y - yc) lanes — up to s*H/2, far more
than the conv support. The key trick making the canvas small: the shift is
**circular** (mod canvas width). Row-to-row shift differs by exactly s, so
a vertical conv at canvas column x_s mixes rows whose content comes from
original columns (x_s - d_y) - s*i — precisely the sheared line — modulo
the canvas. No aliasing as long as the canvas exceeds image + conv apron
+ ceil(12*|s|), so ``Wc = W + 2*(half + ceil(half*smax))`` suffices
regardless of H.

Bilinear in the fractional shift; linear in the image, differentiable in
both the image and the slope (custom VJP: the adjoint of a circular
bilinear shear by s is the shear by -s; the slope gradient uses
d out / d shift = one-lane-rolled difference).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["shear_rows", "shear_canvas_width"]


def shear_canvas_width(w: int, half: int, smax: float) -> int:
    """Canvas width for safe circular shearing: image + conv apron +
    sheared-sampling apron, rounded up to a multiple of 8 lanes."""
    import math

    wc = w + 2 * (half + int(math.ceil(half * smax)))
    return int((wc + 7) // 8 * 8)


def keys_weights(f):
    """Catmull-Rom (Keys, a=-0.5) weights at taps (-1, 0, 1, 2) for
    fractional offset f in [0, 1). Symmetric: w_j(f) == w_{1-j}(1-f)."""
    f2 = f * f
    f3 = f2 * f
    return (-0.5 * (f3 - 2.0 * f2 + f),
            1.5 * f3 - 2.5 * f2 + 1.0,
            -1.5 * f3 + 2.0 * f2 + 0.5 * f,
            0.5 * (f3 - f2))


def lanczos3_weights(f):
    """Normalized Lanczos-3 weights at taps (-2..3) for fractional offset
    f in [0, 1). The windowed-sinc kernel is even, so the adjoint of the
    circular shear stays the shear by -s. ~2x lower interpolation error
    than Keys cubic on Gaussian-smoothed content."""
    eps = 1e-12
    ws = []
    for j in range(-2, 4):
        x = f - j
        px = jnp.pi * x
        ws.append(jnp.where(
            jnp.abs(x) < eps, 1.0,
            3.0 * jnp.sin(px) * jnp.sin(px / 3.0) / (px * px + eps)))
    total = sum(ws)
    return tuple(w / total for w in ws)


def _shear_rows_jnp(x: jnp.ndarray, s: jnp.ndarray, frac: bool) -> jnp.ndarray:
    """Reference implementation: circular per-row cubic column shift.

    out[n, y, v] = x[n, y, (v + d) mod W], Keys-cubic in d = s_n * (y - yc)
    (frac=False: integer floor shift only).
    """
    n, h, w = x.shape
    yc = (h - 1) / 2.0
    rows = jnp.arange(h, dtype=s.dtype)[None, :]  # (1,H)
    d = s[:, None] * (rows - yc)  # (N,H)
    k = jnp.floor(d)
    a = (d - k)[..., None].astype(x.dtype)  # (N,H,1)
    base = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    idx0 = jnp.mod(base + k.astype(jnp.int32)[..., None], w)
    g0 = jnp.take_along_axis(x, idx0, axis=-1)
    if not frac:
        return g0
    wm1, w0, w1, w2 = keys_weights(a)
    out = w0 * g0
    out = out + wm1 * jnp.take_along_axis(x, jnp.mod(idx0 - 1, w), axis=-1)
    out = out + w1 * jnp.take_along_axis(x, jnp.mod(idx0 + 1, w), axis=-1)
    out = out + w2 * jnp.take_along_axis(x, jnp.mod(idx0 + 2, w), axis=-1)
    return out


def _shear_impl(x, s, frac=True):
    if x.ndim != 3:
        raise ValueError(f"shear_rows expects (N, H, W), got {x.shape}")
    if jax.default_backend() == "tpu":
        from .pallas.shear import shear_rows_pallas

        return shear_rows_pallas(x, s, frac=frac)
    return _shear_rows_jnp(x, s, frac)


@partial(jax.custom_vjp, nondiff_argnums=())
def shear_rows(x: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Circular bilinear row shear of a tile batch.

    :param x: (N, H, W) tile canvas (W from :func:`shear_canvas_width`)
    :param s: (N,) shear slope per tile; row y shifts by s*(y - (H-1)/2)
    :return: (N, H, W) sheared canvas; invert with ``shear_rows(y, -s)``
    """
    return _shear_impl(x, s, frac=True)


def _shear_fwd(x, s):
    return _shear_impl(x, s, frac=True), (x, s)


def _shear_bwd(res, g):
    x, s = res
    gx = _shear_impl(g, -s)
    # d out / d d_y ~= z_{k+1} - z_k (first-order; exact for the linear
    # part of the cubic kernel); d d_y / d s = (y - yc)
    z0 = _shear_impl(x, s, frac=False)
    z1 = jnp.roll(z0, -1, axis=-1)
    h = x.shape[1]
    rows = (jnp.arange(h) - (h - 1) / 2.0).astype(x.dtype)[None, :, None]
    gs = jnp.sum(g * (z1 - z0) * rows, axis=(1, 2)).astype(s.dtype)
    return gx, gs


shear_rows.defvjp(_shear_fwd, _shear_bwd)
