"""Fourier-domain primitives: spectral gradients, PSF->OTF, FFT convolution.

TPU-native rewrites of /root/reference/polyblur/filters.py:159-186 (fourier
gradients), :255-273 (p2o) and :31-35 (FFT convolution). The gradient
discretization is kept *exactly* identical to the reference, because the
calibrated affine blur model (c, b) is only valid for this discretization
(reference README.md:100-102).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["fourier_gradients", "spectral_gradients", "p2o", "fft_convolve2d"]


def spectral_gradients(images: jnp.ndarray, backend: str = "auto"):
    """Spectral image gradients, backend-selected.

    Same linear map either way (the matmul operator is built by pushing the
    identity through the FFT discretization — ops/spectral_matmul.py); the
    matmul form rides the MXU and wins for the tile sizes of the hot path,
    the FFT form scales better for very large whole images.
    """
    if backend == "auto":
        backend = "matmul" if max(images.shape[-2:]) <= 1024 else "fft"
    if backend == "matmul":
        from .spectral_matmul import fourier_gradients_matmul

        return fourier_gradients_matmul(images)
    return fourier_gradients(images)


def fourier_gradients(images: jnp.ndarray):
    """Image gradients via Fourier interpolation.

    ``gx = Re IFFT(2*pi*f_w * i * U)`` with ``U`` fftshifted; same for ``gy``
    with the row frequencies. Matches filters.py:159-186 bit-for-bit in f32.

    :param images: (..., H, W) real array
    :return: (grad_x, grad_y), same shape as ``images``
    """
    h, w = images.shape[-2:]
    compute_dtype = jnp.promote_types(images.dtype, jnp.float32)
    U = jnp.fft.fft2(images.astype(compute_dtype))
    U = jnp.fft.fftshift(U, axes=(-2, -1))
    freqh = ((jnp.arange(h) - h // 2) / h).astype(compute_dtype)[:, None]
    freqw = ((jnp.arange(w) - w // 2) / w).astype(compute_dtype)[None, :]
    iU = -jnp.imag(U) + 1j * jnp.real(U)  # i * U
    gxU = jnp.fft.ifftshift(2 * jnp.pi * freqw * iU, axes=(-2, -1))
    gxu = jnp.real(jnp.fft.ifft2(gxU))
    gyU = jnp.fft.ifftshift(2 * jnp.pi * freqh * iU, axes=(-2, -1))
    gyu = jnp.real(jnp.fft.ifft2(gyU))
    return gxu.astype(images.dtype), gyu.astype(images.dtype)


def p2o(psf: jnp.ndarray, shape) -> jnp.ndarray:
    """Point-spread function -> optical transfer function.

    Zero-embed the (B,C,h,w) PSF into (B,C,H,W), roll its center to the
    origin, FFT. Matches filters.py:255-273.
    """
    h, w = psf.shape[-2:]
    compute_dtype = jnp.promote_types(psf.dtype, jnp.float32)
    otf = jnp.zeros(psf.shape[:-2] + tuple(shape), dtype=compute_dtype)
    otf = otf.at[..., :h, :w].set(psf.astype(compute_dtype))
    otf = jnp.roll(otf, (-(h // 2), -(w // 2)), axis=(-2, -1))
    return jnp.fft.fft2(otf)


def fft_convolve2d(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Circular 'same' convolution in the Fourier domain.

    Pads the image circularly by half the kernel support, multiplies by the
    OTF, then crops — matching the reference FFT path (filters.py:31-35).
    ``kernel`` is (B,C,h,w) or (B,1,h,w) and broadcasts over channels.
    """
    ks = kernel.shape[-1] // 2
    pad = [(0, 0)] * (img.ndim - 2) + [(ks, ks), (ks, ks)]
    x = jnp.pad(img, pad, mode="wrap")
    K = p2o(kernel, x.shape[-2:])
    y = jnp.real(jnp.fft.ifft2(K * jnp.fft.fft2(x)))
    return y[..., ks:-ks, ks:-ks].astype(img.dtype)
