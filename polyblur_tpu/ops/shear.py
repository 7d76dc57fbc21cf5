"""Circular row shear: the TPU-native factor of oriented Gaussian filtering.

An anisotropic Gaussian kernel exp(-0.5 q(x, y)) with quadratic form
q = a x^2 + 2 b x y + c y^2 factors as

    q = a (x + (b/a) y)^2 + (c - b^2/a) y^2          (row shear), or
    q = c (y + (b/c) x)^2 + (a - b^2/c) x^2          (column shear)

so convolution with it is ``unshear . conv_y . conv_x . shear`` along either
axis — the same x-then-sheared-axis decomposition as the reference's native
oriented-convolution kernel
(/root/reference/polyblur/separable_convolution/separable_gaussian2d.cpp:91-183),
but with the per-pixel bilinear sampling loop replaced by a whole-image
shear transform so the two 1D convolutions become batched band convolutions
(ops/sep_poly.py). Because ``a c >= b^2`` (positive definite form), the
orientation with the larger quadratic coefficient always has shear slope
``|s| = |b| / max(a, c) <= 1`` — ops/sep_poly.py picks it per sample, which
is what keeps every shear here short.

The shift is **circular** (mod canvas width): row y shifts by
d_y = s * (y - yc) lanes — up to s*H/2, far more than the conv support, but
row-to-row shift differs by exactly s, so vertical convs in the sheared
frame mix rows whose content comes from the sheared line modulo the canvas.
No aliasing as long as the canvas margin exceeds the *composite* operator's
x-reach — for the degree-3 polynomial chain that is three kernel
applications, hence margin ~ half * (1 + 3|s|) (see
ops.sep_poly.safe_margin; the round-2 margin of half*(1+|s|) under-counted
the chain and aliased at |s| > ~0.6).

Two interpolators:

* :func:`shear_rows` — Lanczos-3 in the fractional shift (the windowed
  sinc is even, so the adjoint of the circular shear by s stays the shear
  by -s; custom VJP provided). Used where raw content is sheared.
* :func:`gauss_fold_shear_rows` — the EXACT fold of ``conv_x(coef) . shear``:
  sampling a Gaussian-smoothed row at a fractional offset equals convolving
  with the fractionally-shifted Gaussian sampled at integers, so the
  fractional part of the shift folds into the taps analytically and the
  transform has zero interpolation error. This is the standalone
  (single-application) form of the spectral fold;
  ops/sep_poly.py::_spectral_composition evaluates the same phase-ramp x
  tap-spectrum product inline for the whole degree-3 chain (one rfft pair
  total), and tests use this function as its single-fold oracle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["shear_rows", "gauss_fold_shear_rows", "shear_canvas_width",
           "keys_weights", "lanczos3_weights"]


def shear_canvas_width(w: int, half: int, smax: float) -> int:
    """Canvas width for safe circular shearing of the degree-3 polynomial
    chain: image + composite conv/shear apron, rounded up to 8 lanes."""
    from .sep_poly import safe_margin

    return int((w + 2 * safe_margin(half, smax) + 7) // 8 * 8)


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
    circular shear stays the shear by -s. Lower interpolation error than
    Keys cubic on natural content (measured +2 dB on the full separable
    pipeline vs the fft reference)."""
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
    """Reference implementation: circular per-row Lanczos-3 column shift.

    out[n, y, v] = x[n, y, (v + d) mod W], Lanczos-3 in d = s_n * (y - yc)
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
    ws = lanczos3_weights(a)
    out = ws[2] * g0  # tap j=0
    for wj, off in zip(ws, range(-2, 4)):
        if off == 0:
            continue
        out = out + wj * jnp.take_along_axis(x, jnp.mod(idx0 + off, w),
                                             axis=-1)
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
    """Circular Lanczos-3 row shear of a tile batch.

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
    # part of the interpolation kernel); d d_y / d s = (y - yc)
    z0 = _shear_impl(x, s, frac=False)
    z1 = jnp.roll(z0, -1, axis=-1)
    h = x.shape[1]
    rows = (jnp.arange(h) - (h - 1) / 2.0).astype(x.dtype)[None, :, None]
    gs = jnp.sum(g * (z1 - z0) * rows, axis=(1, 2)).astype(s.dtype)
    return gx, gs


shear_rows.defvjp(_shear_fwd, _shear_bwd)


def gauss_fold_shear_rows(x: jnp.ndarray, s: jnp.ndarray, coef: jnp.ndarray,
                          half: int) -> jnp.ndarray:
    """Exact ``conv_x(coef) . circular_shear(s)``, evaluated spectrally.

    The circular fractional shift is diagonal in the x-frequency domain
    (a pure phase ramp) and so is the 2*half+1-tap Gaussian conv (its real
    cosine spectrum), so the composite is one rfft, one elementwise
    multiply by ``Ghat(k) * exp(i 2 pi k d_y / W)``, one irfft — the shift
    part is the IDEAL circular interpolator (zero interpolation error; the
    Gaussian spectrum windows any ringing) and the conv part is exactly
    the L1-normalized integer-tap kernel used everywhere else. In the
    Pallas kernels the same math runs as four in-VMEM DFT matmuls instead
    of 37 roll passes (rolls were ~60% of the round-3 mega kernel's time).

    Differentiable in x, s and coef through standard autodiff.
    """
    if x.ndim != 3:
        raise ValueError(f"gauss_fold_shear_rows expects (N, H, W), "
                         f"got {x.shape}")
    return _gauss_fold_shear_jnp(x, s, coef, half)


def _gauss_fold_shear_jnp(x, s, coef, half):
    n, h, w = x.shape
    Z = jnp.fft.rfft(x.astype(jnp.float32), axis=-1)   # (N, H, K)
    k = jnp.arange(Z.shape[-1], dtype=jnp.float32)
    taps = jnp.arange(-half, half + 1, dtype=jnp.float32)
    kt = jnp.exp(-0.5 * coef.astype(jnp.float32)[:, None] * taps[None] ** 2)
    kt = kt / jnp.sum(kt, axis=-1, keepdims=True)      # (N, 2*half+1)
    ang = (2.0 * jnp.pi / w) * k[None, :] * taps[:, None]   # (taps, K)
    ghat = jnp.einsum("nt,tk->nk", kt, jnp.cos(ang))   # (N, K) real
    yc = (h - 1) / 2.0
    rows = jnp.arange(h, dtype=jnp.float32)
    d = s.astype(jnp.float32)[:, None] * (rows[None, :] - yc)   # (N, H)
    ph = jnp.exp(1j * (2.0 * jnp.pi / w)
                 * d[:, :, None] * k[None, None, :])
    out = jnp.fft.irfft(Z * ghat[:, None, :] * ph, n=w, axis=-1)
    return out.astype(x.dtype)
