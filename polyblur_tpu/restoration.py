"""Non-blind restoration: degree-3 polynomial deconvolution + halo removal.

TPU-native rewrite of /root/reference/polyblur/deblurring.py:113-239. With
blur operator K and coefficients derived from (alpha, beta):

    a3 = alpha/2 - beta + 2,  a2 = 3 beta - alpha - 6,  a1 = 5 - 3 beta + alpha/2
    out = a3 K^3 u + a2 K^2 u + a1 K u + beta u            (Horner evaluated)

Two interchangeable backends are kept deliberately (they cross-check each
other, SURVEY.md section 4): an FFT backend (circular model, one fft2/ifft2
pair per application) and a direct backend (grouped spatial convolutions /
separable Gaussian passes feeding the MXU/VPU).

The halo-removal mask fixes the reference's ``grad_prod_`` bug
(deblurring.py:173-174 computes ``-gy*gy`` instead of ``-gy*gouty``; see
SURVEY.md section 2.4 item 2).
"""

from __future__ import annotations

import jax.numpy as jnp

from .ops.conv import convolve2d
from .ops.fourier import fourier_gradients, spectral_gradients, p2o
from .utils.imaging import pad_with_kernel, crop_with_kernel
from . import edgetaper as _edgetaper

__all__ = [
    "polynomial_coefficients",
    "compute_polynomial",
    "compute_polynomial_fft",
    "compute_polynomial_direct",
    "halo_masking",
    "inverse_filtering_rank3",
]


def polynomial_coefficients(alpha, beta):
    a3 = alpha / 2.0 - beta + 2.0
    a2 = 3.0 * beta - alpha - 6.0
    a1 = 5.0 - 3.0 * beta + alpha / 2.0
    return a3, a2, a1


def compute_polynomial_fft(img: jnp.ndarray, kernel: jnp.ndarray, alpha, beta,
                           not_symmetric: bool = False) -> jnp.ndarray:
    """Fourier-domain polynomial filter (deblurring.py:141-169).

    Cost per call: one fft2, one ifft2, the kernel's OTF fft2, and three
    complex multiply-adds — all fused by XLA.
    """
    h, w = img.shape[-2:]
    Y = jnp.fft.fft2(img.astype(jnp.promote_types(img.dtype, jnp.float32)))
    K = p2o(kernel, (h, w))
    if not_symmetric:
        # Pure-phase correction for non-symmetric kernels.
        C = jnp.conj(K) / (jnp.abs(K) + 1e-8)
        Y = C * Y
    a3, a2, a1 = polynomial_coefficients(alpha, beta)
    X = a3 * Y
    X = K * X + a2 * Y
    X = K * X + a1 * Y
    X = K * X + beta * Y
    return jnp.real(jnp.fft.ifft2(X)).astype(img.dtype)


def compute_polynomial_direct(img: jnp.ndarray, kernel, alpha, beta,
                              method: str = "direct") -> jnp.ndarray:
    """Spatial-domain polynomial filter (deblurring.py:122-138).

    ``kernel`` is a (B,C,h,w)/(B,1,h,w) array, or a (sigma, rho, theta)
    tuple for the separable path.
    """
    a3, a2, a1 = polynomial_coefficients(alpha, beta)
    imout = a3 * img
    imout = convolve2d(imout, kernel, method=method) + a2 * img
    imout = convolve2d(imout, kernel, method=method) + a1 * img
    return convolve2d(imout, kernel, method=method) + beta * img


def compute_polynomial(img, kernel, alpha, beta, method: str = "fft",
                       not_symmetric: bool = False, ker_size: int = 25):
    """Backend dispatcher (deblurring.py:113-119).

    ``direct_separable`` with a ``(sigma, rho, theta)`` kernel tuple takes
    the shear-factorized MXU hot path (ops/sep_poly.py) — the TPU-native
    equivalent of the reference's oriented separable C++ kernel.
    ``ker_size`` only applies to parametric kernels (2D kernels carry
    their own support).
    """
    if method == "fft":
        return compute_polynomial_fft(img, kernel, alpha, beta, not_symmetric)
    if method == "direct_separable" and isinstance(kernel, (tuple, list)):
        from .ops.sep_poly import compute_polynomial_separable

        sigma, rho, theta = kernel
        return compute_polynomial_separable(img, sigma, rho, theta, alpha,
                                            beta, ker_size=ker_size)
    if method in ("direct", "direct_separable"):
        return compute_polynomial_direct(img, kernel, alpha, beta, method)
    raise ValueError(f"{method!r} not implemented")


def halo_masking(img: jnp.ndarray, imout: jnp.ndarray,
                 grad_img=None) -> jnp.ndarray:
    """Replace gradient-inverted pixels of the output by the input (Alg. 5).

    ``M = -<grad u, grad u_hat>`` per pixel, ``nM = sum ||grad u||^2``,
    ``z = clip(M / (nM + M), 0)``, ``out = z u + (1 - z) u_hat``
    (deblurring.py:193-208 with the grad_prod_ bug fixed).
    """
    if grad_img is None:
        grad_x, grad_y = spectral_gradients(img)
    else:
        grad_x, grad_y = grad_img
    gout_x, gout_y = spectral_gradients(imout)
    M = (-grad_x * gout_x) + (-grad_y * gout_y)
    nM = jnp.sum(grad_x * grad_x + grad_y * grad_y, axis=(-2, -1), keepdims=True)
    # 1e-12 guard: keeps gradient-free (constant) images finite; inert otherwise.
    z = jnp.clip(M / (nM + M + 1e-12), 0.0, None)
    return imout + z * (img - imout)


def inverse_filtering_rank3(img: jnp.ndarray, kernel, alpha=2.0, beta=4.0,
                            correlate: bool = False, remove_halo: bool = False,
                            do_edgetaper: bool = False, grad_img=None,
                            method: str = "fft",
                            ker_size: int = 25,
                            prefer_xla: bool = False) -> jnp.ndarray:
    """One polynomial deconvolution step with padding/taper/halo handling.

    Mirrors deblurring.py:211-239: replicate-pad by half the kernel support,
    optionally edge-tape, apply p(K), crop back, optionally mask halos,
    clamp to [0, 1]. ``ker_size`` sets the support for parametric
    ``(sigma, rho, theta)`` kernels (the reference's ker_size surface,
    deblurring.py:23); 2D kernel arrays carry their own.
    """
    from .utils.profiling import record_dispatch

    is_param_kernel = isinstance(kernel, (tuple, list))
    ksize = ker_size if is_param_kernel else kernel.shape[-1]
    fast = (is_param_kernel and method == "direct_separable"
            and not do_edgetaper)
    record_dispatch("inverse_filtering_rank3",
                    "separable_fast" if fast else f"generic/{method}")
    if fast:
        # fast path: padding + crop + final clamp fused into the kernel
        from .ops.sep_poly import compute_polynomial_separable

        sigma, rho, theta = kernel
        if remove_halo:
            imout = compute_polynomial_separable(img, sigma, rho, theta,
                                                 alpha, beta, prepad=True,
                                                 ker_size=ksize,
                                                 prefer_xla=prefer_xla)
            imout = halo_masking(img, imout, grad_img)
            return jnp.clip(imout, 0.0, 1.0)
        return compute_polynomial_separable(img, sigma, rho, theta,
                                            alpha, beta, prepad=True,
                                            clip=True, ker_size=ksize,
                                            prefer_xla=prefer_xla)
    if correlate and not is_param_kernel:
        kernel = jnp.rot90(kernel, k=2, axes=(-2, -1))
    padded = pad_with_kernel(img, ksize=ksize)
    if do_edgetaper:
        # Applied for parametric kernels too (deblurring.py:229-230 tapers
        # on every method) — edgetaper builds the 2D kernel from
        # (sigma, rho, theta) when needed.
        padded = _edgetaper.edgetaper(padded, kernel, method=method)
    imout = compute_polynomial(padded, kernel, alpha, beta, method=method,
                               ker_size=ksize)
    imout = crop_with_kernel(imout, ksize=ksize)
    if remove_halo:
        # The reference compares against the (possibly edge-tapered) padded
        # image cropped back, not the raw input (deblurring.py:236-238).
        imout = halo_masking(crop_with_kernel(padded, ksize=ksize), imout, grad_img)
    return jnp.clip(imout, 0.0, 1.0)
