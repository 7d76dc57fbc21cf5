"""Spatial-domain convolutions with per-sample kernels.

TPU-native rewrites of the reference convolution stack:
  * grouped direct 2D convolution (/root/reference/polyblur/filters.py:14-49)
  * axis-aligned separable Gaussian convolution (filters.py:76-93 and the
    C++ ortho path, separable_convolution/separable_gaussian2d.cpp:47-88)
  * oblique ("xt") separable Gaussian convolution — the reference's CUDA
    stub (filters.py:96-98) / C++ loop (separable_gaussian2d.cpp:91-183),
    re-derived here as fully vectorized shear sampling: for each tap the
    sheared sample line reduces to a statically row-shifted, fractionally
    column-shifted image, so the whole kernel is tap-unrolled VPU work with
    no per-pixel gathers.

Unlike the reference (which mis-handles batches > 1 in ``conv2d_``, see
SURVEY.md section 2.4), every op here treats the batch axis correctly by
flattening (B, C) into convolution groups.

Note on normalization: the reference C++ builds *unnormalized* Gaussian taps
with data-dependent support; we use the static ``ksize`` support of the
Python path and L1-normalize the taps (filters.py:80-81 semantics), which
preserves DC gain under truncation.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = [
    "conv2d_grouped",
    "convolve2d",
    "gaussian_taps_1d",
    "separable_gaussian_conv2d",
]


def conv2d_grouped(img: jnp.ndarray, kernel: jnp.ndarray,
                   padding: str = "same") -> jnp.ndarray:
    """'same' cross-correlation where every (b, c) slice has its own kernel.

    :param img: (B, C, H, W)
    :param kernel: (B, C, h, w) or (B, 1, h, w) (broadcast over channels)
    :return: (B, C, H, W)

    Reference behavior: filters.py:40-49 (torch ``F.conv2d`` is a
    cross-correlation, no kernel flip; zero 'same' padding).
    """
    b, c, h, w = img.shape
    if kernel.shape[1] == 1 and c > 1:
        kernel = jnp.broadcast_to(kernel, (b, c) + kernel.shape[2:])
    kh, kw = kernel.shape[-2:]
    x = img.reshape(1, b * c, h, w)
    k = kernel.reshape(b * c, 1, kh, kw).astype(img.dtype)
    if padding == "same":
        pads = [((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)]
    elif padding == "valid":
        pads = [(0, 0), (0, 0)]
    else:
        raise ValueError(f"padding {padding!r} not supported")
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=pads,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=b * c,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, c, h, w).astype(img.dtype)


def convolve2d(img: jnp.ndarray, kernel, method: str = "direct") -> jnp.ndarray:
    """Dispatcher mirroring filters.py:14-37.

    ``kernel`` is either a (B,C,h,w)/(B,1,h,w) array (direct/fft) or a
    ``(sigma, rho, theta)`` tuple of (B, C) arrays (direct_separable).
    """
    if method == "direct":
        if isinstance(kernel, (tuple, list)):
            sigma, rho, theta = kernel
            return separable_gaussian_conv2d(img, sigma, rho, theta)
        return conv2d_grouped(img, kernel)
    if method == "fft":
        from .fourier import fft_convolve2d

        return fft_convolve2d(img, kernel)
    if method == "direct_separable":
        sigma, rho, theta = kernel
        return separable_gaussian_conv2d(img, sigma, rho, theta)
    raise ValueError(f"Convolution method {method!r} is not implemented")


def gaussian_taps_1d(sigma: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """L1-normalized 1D Gaussian taps on the centered grid of size ``ksize``.

    :param sigma: (N,) stds
    :return: (N, ksize)
    """
    t = jnp.arange(-ksize // 2 + 1, ksize // 2 + 1, dtype=sigma.dtype)
    k = jnp.exp(-(t * t)[None, :] / (2.0 * (sigma * sigma)[:, None]))
    return k / jnp.sum(k, axis=-1, keepdims=True)


def _conv1d_rows(img: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Per-sample 1D convolution along the last axis with replicate padding.

    :param img: (N, H, W); :param taps: (N, k) -> (N, H, W)
    """
    n, h, w = img.shape
    k = taps.shape[-1]
    r_left = k // 2 - 1 if k % 2 == 0 else k // 2
    r_right = k // 2
    x = jnp.pad(img, ((0, 0), (0, 0), (r_left, r_right)), mode="edge")
    x = x.reshape(1, n, h, w + r_left + r_right)
    kern = taps.reshape(n, 1, 1, k).astype(img.dtype)
    out = jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding=[(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=n,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(n, h, w).astype(img.dtype)


def _ortho_conv(img: jnp.ndarray, sigma_x: jnp.ndarray, sigma_y: jnp.ndarray,
                ksize: int) -> jnp.ndarray:
    """Axis-aligned separable pass: rows with sigma_x, cols with sigma_y."""
    out = _conv1d_rows(img, gaussian_taps_1d(sigma_x, ksize))
    out = jnp.swapaxes(out, -1, -2)
    out = _conv1d_rows(out, gaussian_taps_1d(sigma_y, ksize))
    return jnp.swapaxes(out, -1, -2)


def _shift_rows_clip(img: jnp.ndarray, shift: int) -> jnp.ndarray:
    """out[y] = img[clip(y + shift)] for a static integer shift. (N,H,W)."""
    h = img.shape[-2]
    if shift == 0:
        return img
    if shift > 0:
        body = img[:, shift:, :]
        edge = jnp.repeat(img[:, -1:, :], shift, axis=1)
        return jnp.concatenate([body, edge], axis=1)
    body = img[:, :shift, :]
    edge = jnp.repeat(img[:, :1, :], -shift, axis=1)
    return jnp.concatenate([edge, body], axis=1)


def _frac_shift_cols(img: jnp.ndarray, dx: jnp.ndarray) -> jnp.ndarray:
    """out[.., x] = linear interp of img at column position x - dx (clipped).

    ``dx`` is a per-sample traced scalar, shape (N,). Uses two dynamic
    column gathers with shared per-sample indices (lane-dim ``take``).
    """
    n, h, w = img.shape
    df = jnp.floor(dx)
    a = (dx - df)[:, None, None].astype(img.dtype)
    base = jnp.arange(w)[None, :] - df[:, None].astype(jnp.int32)
    idx0 = jnp.clip(base, 0, w - 1)
    idx1 = jnp.clip(base - 1, 0, w - 1)
    take = jax.vmap(lambda im, ix: jnp.take(im, ix, axis=-1))
    return (1.0 - a) * take(img, idx0) + a * take(img, idx1)


def _xt_conv(img: jnp.ndarray, sigma: jnp.ndarray, rho: jnp.ndarray,
             theta: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Oblique separable pass (x conv then sheared-line conv).

    Vectorized form of separable_gaussian2d.cpp:91-183: an x-axis pass with
    std ``sigma_x = sigma*rho/sigma_phi`` followed by taps along the sheared
    direction (dy, dx) = (1, 1/mu); for tap i the sample plane is the image
    shifted i rows (replicate-clipped) and i/mu columns (bilinear).
    """
    co = jnp.cos(theta)
    so = jnp.sin(theta)
    dot = rho * rho * co * co + sigma * sigma * so * so
    sigma_phi = jnp.sqrt(dot)
    sigma_x = sigma * rho / sigma_phi
    mu = dot / (rho * rho - sigma * sigma + 1e-5)

    taps_x = gaussian_taps_1d(sigma_x, ksize)
    half = (ksize - 1) // 2
    t = jnp.arange(0, half + 1, dtype=sigma.dtype)
    kphi = jnp.exp(-(t * t)[None, :] / (2.0 * (sigma_phi * sigma_phi)[:, None]))
    kphi = kphi / (kphi[:, :1] + 2.0 * jnp.sum(kphi[:, 1:], axis=-1, keepdims=True))

    imgx = _conv1d_rows(img, taps_x)
    out = kphi[:, 0][:, None, None] * imgx
    inv_mu = 1.0 / mu
    for i in range(1, half + 1):
        up = _frac_shift_cols(_shift_rows_clip(imgx, -i), -i * inv_mu)
        dn = _frac_shift_cols(_shift_rows_clip(imgx, i), i * inv_mu)
        out = out + kphi[:, i][:, None, None] * (up + dn)
    return out


def separable_gaussian_conv2d(img: jnp.ndarray, sigma: jnp.ndarray,
                              rho: jnp.ndarray, theta: jnp.ndarray,
                              ksize: int = 25) -> jnp.ndarray:
    """Anisotropic Gaussian blur via two 1D passes, per-sample parameters.

    Replaces the reference's never-built C++ dispatcher
    (separable_gaussian2d.cpp:186-248). Orthogonal-orientation samples
    (theta = 0/90/180 deg, or isotropic sigma == rho) take the axis-aligned
    path; the rest take the sheared path. Under jit both branches are
    evaluated and blended by mask — ragged boolean batches do not exist in
    XLA; kernels stay fully shaped and the select is free relative to the
    convolutions.

    :param img: (B, C, H, W)
    :param sigma, rho, theta: (B, C) or (B, 1) per-sample blur parameters
    :return: (B, C, H, W)
    """
    b, c, h, w = img.shape
    if sigma.shape[1] != c:
        sigma = jnp.broadcast_to(sigma, (b, c))
        rho = jnp.broadcast_to(rho, (b, c))
        theta = jnp.broadcast_to(theta, (b, c))
    x = img.reshape(b * c, h, w)
    sg = sigma.reshape(-1)
    rh = rho.reshape(-1)
    th = theta.reshape(-1)

    atol = 1e-4
    deg = th * (180.0 / math.pi)
    is_ortho = jnp.logical_or(jnp.mod(deg, 90.0) <= atol, sg == rh)

    # Axis-aligned: theta ~ 0 or 180 -> sigma along x; theta ~ 90 -> sigma along y.
    along_x = jnp.mod(jnp.floor(deg), 180.0) < atol
    sx = jnp.where(along_x, sg, rh)
    sy = jnp.where(along_x, rh, sg)

    out_ortho = _ortho_conv(x, sx, sy, ksize)
    # Keep the oblique branch numerically safe where it is masked out.
    th_safe = jnp.where(is_ortho, math.pi / 4.0, th)
    sg_safe = jnp.where(is_ortho, 1.0, sg)
    rh_safe = jnp.where(is_ortho, 0.5, rh)
    out_xt = _xt_conv(x, sg_safe, rh_safe, th_safe, ksize)

    out = jnp.where(is_ortho[:, None, None], out_ortho, out_xt)
    return out.reshape(b, c, h, w)
