"""Blind anisotropic-Gaussian blur estimation from directional gradient statistics.

TPU-native rewrite of /root/reference/polyblur/blur_estimation.py. The chain
is: spectral gradients -> per-angle directional gradient maxima -> Keys-cubic
interpolation to a finer angle grid -> argmin angle (the blur direction) ->
affine model ``sigma^2 = c^2 / f^2 - b^2`` with clamping -> parametric kernel.

Everything is batched over B and expressed with static shapes so the whole
chain jit-compiles into one fused XLA program (no per-channel Python loop on
the hot path; the multichannel variant vmaps over channels instead of the
reference's ``for channel in range(C)`` loop, blur_estimation.py:56-77).

The reference's ``return_2d_filters=False`` branch crashes on an undefined
name (blur_estimation.py:77); here parameter output is first-class.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .ops.fourier import spectral_gradients
from .ops.gaussian import batch_gaussian_kernels

__all__ = [
    "gaussian_blur_estimation",
    "compute_gradient_magnitudes",
    "find_maximal_blur_direction",
    "compute_gaussian_parameters",
    "cubic_interpolator",
    "normalize_quantiles",
]


def normalize_quantiles(images: jnp.ndarray, q: float = 0.0) -> jnp.ndarray:
    """Range-normalize per (b, c) slice, optionally clipping quantiles.

    Matches blur_estimation.py:96-109: for q > 0 use the (q, 1-q) quantiles,
    else the min/max; then affine rescale and clamp to [0, 1].
    """
    b, c = images.shape[:2]
    if q > 0:
        flat = images.reshape(b, c, -1)
        vmin = jnp.quantile(flat, q, axis=-1, keepdims=True)[..., None]
        vmax = jnp.quantile(flat, 1.0 - q, axis=-1, keepdims=True)[..., None]
    else:
        vmin = jnp.amin(images, axis=(-2, -1), keepdims=True)
        vmax = jnp.amax(images, axis=(-2, -1), keepdims=True)
    # The 1e-8 guard (absent in the reference) keeps constant images finite
    # instead of NaN; for any non-degenerate image it is numerically inert.
    return jnp.clip((images - vmin) / jnp.maximum(vmax - vmin, 1e-8), 0.0, 1.0)


def compute_gradient_magnitudes(grad_x: jnp.ndarray, grad_y: jnp.ndarray,
                                n_angles: int = 6) -> jnp.ndarray:
    """Max absolute directional derivative per sampled angle.

    ``max_xy | cos(t) gx - sin(t) gy |`` for t in linspace(0, pi, n_angles+1);
    matches blur_estimation.py:122-134 (gradients pre-averaged over channels).

    :param grad_x, grad_y: (B, C, H, W)
    :return: (B, n_angles + 1)
    """
    gx = jnp.mean(grad_x, axis=1)[:, None]  # (B,1,H,W)
    gy = jnp.mean(grad_y, axis=1)[:, None]
    angles = jnp.linspace(0.0, math.pi, n_angles + 1).astype(gx.dtype)
    cos = jnp.cos(angles)[None, :, None, None]
    sin = jnp.sin(angles)[None, :, None, None]
    mags = jnp.abs(cos * gx - sin * gy)  # (B, n_angles+1, H, W)
    return jnp.amax(mags, axis=(-2, -1))


def cubic_interpolator(x_new: jnp.ndarray, x: jnp.ndarray,
                       y: jnp.ndarray) -> jnp.ndarray:
    """Keys cubic interpolation of ``y(x)`` at ``x_new`` as one small matmul.

    Matches blur_estimation.py:138-148 including the 1e-5 weight-sum guard.
    Shapes: x_new (..., N), x (..., n), y (..., n) -> (..., N).
    """
    d = jnp.abs(x_new[..., :, None] - x[..., None, :])
    w = jnp.where(
        d < 1.0,
        (1.5 * d - 2.5) * d * d + 1.0,
        jnp.where(d < 2.0, ((-0.5 * d + 2.5) * d - 4.0) * d + 2.0, 0.0),
    )
    w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-5)
    return jnp.einsum("...nk,...k->...n", w, y)


def find_maximal_blur_direction(gradient_magnitudes: jnp.ndarray,
                                thetas: jnp.ndarray,
                                interpolated_thetas: jnp.ndarray):
    """Blur direction = argmin of the interpolated directional maxima.

    Matches blur_estimation.py:151-167: interpolate the (B, n+1) magnitudes
    onto the fine angle grid, take the argmin angle and its magnitude, and
    read the magnitude at the +90 deg orthogonal angle.

    :return: (magnitudes_normal, magnitudes_ortho, theta_rad), each (B, 1)
    """
    n_interp = interpolated_thetas.shape[-1]
    interp = cubic_interpolator(
        interpolated_thetas / n_interp, thetas / n_interp, gradient_magnitudes
    )  # (B, N)
    i_min = jnp.argmin(interp, axis=-1, keepdims=True)
    thetas_normal = jnp.take_along_axis(
        jnp.broadcast_to(interpolated_thetas, interp.shape), i_min, axis=-1
    )
    magnitudes_normal = jnp.take_along_axis(interp, i_min, axis=-1)
    thetas_ortho = jnp.mod(thetas_normal + 90.0, 180.0)
    i_ortho = (thetas_ortho / (180.0 / n_interp)).astype(jnp.int32)
    magnitudes_ortho = jnp.take_along_axis(interp, i_ortho, axis=-1)
    return magnitudes_normal, magnitudes_ortho, thetas_normal * (math.pi / 180.0)


def compute_gaussian_parameters(magnitudes_normal: jnp.ndarray,
                                magnitudes_ortho: jnp.ndarray,
                                c, b):
    """Affine blur model with the reference's exact guards.

    ``sigma = sqrt(clip(c^2 / (f^2 + 1e-8) - b^2, 0.09, 16))`` i.e. stds
    clamped to [0.3, 4] px (blur_estimation.py:171-185).
    """
    cc = c * c
    bb = b * b
    sigma2 = cc / (magnitudes_normal * magnitudes_normal + 1e-8) - bb
    sigma = jnp.sqrt(jnp.clip(sigma2, 0.09, 16.0))
    rho2 = cc / (magnitudes_ortho * magnitudes_ortho + 1e-8) - bb
    rho = jnp.sqrt(jnp.clip(rho2, 0.09, 16.0))
    return sigma, rho


def _mags_xla(img: jnp.ndarray, n_angles: int) -> jnp.ndarray:
    """normalize -> spectral gradients -> directional maxima (q=0 path)."""
    img_norm = normalize_quantiles(img, q=0.0)
    gx, gy = spectral_gradients(img_norm)
    return compute_gradient_magnitudes(gx, gy, n_angles=n_angles)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _mags_fast(img: jnp.ndarray, n_angles: int) -> jnp.ndarray:
    """Directional maxima via the fused Pallas reduction (the BASELINE
    north-star kernel) on TPU; the XLA chain elsewhere and in the VJP."""
    # the fused kernel holds the (W, W)/(H, H) derivative operators and
    # the gradient fields in VMEM — only viable at tile scale; whole
    # images take the XLA chain (whose matmul/fft backend auto-switches).
    # The cap is the shared mega-kernel envelope (compile-probed on v5e
    # at 576 and 640 with the kernel's 100MB scoped-VMEM limit).
    from .envelopes import MEGA_MAX_TILE
    from .utils.profiling import record_dispatch

    if (jax.default_backend() == "tpu"
            and max(img.shape[-2:]) <= MEGA_MAX_TILE):
        from .ops.pallas.est_fused import directional_maxima_pallas

        record_dispatch("directional_maxima", "pallas_fused")
        return directional_maxima_pallas(img, n_angles=n_angles).astype(
            img.dtype)
    record_dispatch("directional_maxima", "xla")
    return _mags_xla(img, n_angles)


def _mags_fast_fwd(img, n_angles):
    return _mags_fast(img, n_angles), img


def _mags_fast_bwd(n_angles, img, g):
    _, vjp = jax.vjp(lambda x: _mags_xla(x, n_angles), img)
    return vjp(g)


_mags_fast.defvjp(_mags_fast_fwd, _mags_fast_bwd)


def _estimate_single_channel(img: jnp.ndarray, c, b, q: float,
                             discard_saturation: bool,
                             thetas: jnp.ndarray,
                             interpolated_thetas: jnp.ndarray,
                             n_angles: int):
    """(sigma, rho, theta) for one (B, 1, H, W) image stack."""
    if q == 0.0 and not discard_saturation:
        mags = _mags_fast(img, n_angles)
    else:
        if discard_saturation:
            mask = img > 0.99
        else:
            mask = jnp.zeros_like(img, dtype=bool)
        img_norm = normalize_quantiles(img, q=q)
        gx, gy = spectral_gradients(img_norm)
        gx = jnp.where(mask, 0.0, gx)
        gy = jnp.where(mask, 0.0, gy)
        mags = compute_gradient_magnitudes(gx, gy, n_angles=n_angles)
    m_n, m_o, theta = find_maximal_blur_direction(mags, thetas, interpolated_thetas)
    sigma, rho = compute_gaussian_parameters(m_n, m_o, c=c, b=b)
    return sigma, rho, theta


@partial(jax.jit, static_argnames=(
    "q", "n_angles", "n_interpolated_angles", "ker_size",
    "discard_saturation", "multichannel", "return_2d_filters"))
def gaussian_blur_estimation(img: jnp.ndarray, c=0.362, b=0.468, q: float = 0.0,
                             n_angles: int = 6, n_interpolated_angles: int = 30,
                             ker_size: int = 25,
                             discard_saturation: bool = False,
                             multichannel: bool = False,
                             return_2d_filters: bool = True):
    """Estimate per-image (optionally per-channel) Gaussian blur kernels.

    :param img: (B, C, H, W) blurry image(s) in [0, 1]
    :return: (B, C', ker_size, ker_size) kernels, or the ``(sigma, rho,
        theta)`` tuple of (B, C') arrays when ``return_2d_filters`` is False.
        C' = C when ``multichannel`` and C != 3-collapsed, else 1.

    Mirrors blur_estimation.py:18-79, with the angle grids built statically
    (integer-truncated, exactly like the reference's ``.long()`` tensors in
    deblurring.py:62-63).
    """
    dt = img.dtype
    # Integer-truncated angle grids, as in the reference pipeline.
    thetas = jnp.floor(jnp.linspace(0.0, 180.0, n_angles + 1)).astype(dt)[None]
    interpolated_thetas = jnp.floor(
        jnp.arange(0.0, 180.0, 180.0 / n_interpolated_angles)
    ).astype(dt)[None]

    if img.shape[1] == 3 or not multichannel:
        img = jnp.mean(img, axis=1, keepdims=True)

    def estimate(channel_img):  # (B,1,H,W)
        return _estimate_single_channel(
            channel_img, c, b, q, discard_saturation,
            thetas, interpolated_thetas, n_angles)

    n_ch = img.shape[1]
    if n_ch == 1:
        sigma, rho, theta = estimate(img)  # each (B,1)
    else:
        per_ch = jax.vmap(estimate, in_axes=1, out_axes=2)(img[:, :, None])
        sigma, rho, theta = (x[:, 0, :] for x in per_ch)  # (B,C)

    if not return_2d_filters:
        return sigma, rho, theta

    bsz, csz = sigma.shape
    flat = batch_gaussian_kernels(
        theta.reshape(-1, 1), sigma.reshape(-1, 1), rho.reshape(-1, 1), ker_size
    )  # (B*C,1,k,k)
    return flat.reshape(bsz, csz, ker_size, ker_size).astype(dt)
