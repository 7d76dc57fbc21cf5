"""Spectral operators recast as constant-matrix MXU matmuls.

The reference computes image gradients with FFT roundtrips
(/root/reference/polyblur/filters.py:159-186). On TPU the FFT unit is slow
relative to the MXU (measured ~80ms for a 351x424x424 fft2+ifft2 roundtrip
on v5e vs <1ms of equivalent matmul time), and the gradient operator is
*linear and shift-invariant*, i.e. multiplication by a constant circulant
matrix per axis:

    gx = img @ Dw.T      (Dw = Re IDFT . diag(2 pi f i) . DFT, W x W)
    gy = Dh @ img        (same along the row axis)

The matrices are built once per (static) size in float64 NumPy by pushing
the identity through the reference discretization — including its
fftshift/Nyquist layout quirk — so the result is the *exact* same linear
map as the reference FFT path (the calibrated (c, b) of the affine blur
model depend on this discretization; reference README.md:100-102).

These matmuls are the hot-loop gradient path; ops/fourier.py remains the
oracle implementation.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["derivative_matrix", "fourier_gradients_matmul"]


@lru_cache(maxsize=32)
def _derivative_matrix_np(n: int) -> np.ndarray:
    """(n, n) float32 matrix of the reference's 1D spectral derivative.

    Columns are the derivative of the canonical basis vectors under
    ``Re IFFT(2 pi f * i * FFT(.))`` with the fftshifted frequency layout
    of filters.py:166-186 (f = (arange(n) - n//2)/n, applied to the
    shifted spectrum).
    """
    eye = np.eye(n, dtype=np.float64)
    U = np.fft.fftshift(np.fft.fft(eye, axis=0), axes=0)
    f = ((np.arange(n) - n // 2) / n)[:, None]
    G = np.fft.ifft(np.fft.ifftshift(2.0 * np.pi * f * (1j * U), axes=0),
                    axis=0)
    return np.real(G).astype(np.float32)


def derivative_matrix(n: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(_derivative_matrix_np(n), dtype=dtype)


def fourier_gradients_matmul(images: jnp.ndarray):
    """Exact spectral gradients via two constant-matrix matmuls.

    Drop-in replacement for :func:`ops.fourier.fourier_gradients` on the
    hot path — identical linear map, MXU-friendly. f32 accumulation.

    :param images: (..., H, W)
    :return: (grad_x, grad_y), same shape
    """
    h, w = images.shape[-2:]
    compute = jnp.promote_types(images.dtype, jnp.float32)
    x = images.astype(compute)
    dw = derivative_matrix(w, compute)
    dh = derivative_matrix(h, compute)
    # gx[..., y, x] = sum_v img[..., y, v] * Dw[x, v]
    # HIGHEST precision: on TPU, default f32 matmuls truncate inputs to
    # bf16 on the MXU (~3% error in the gradients); the blur estimates
    # gate the whole pipeline, so spend the 3-pass f32 here.
    gx = jnp.einsum("...hv,wv->...hw", x, dw,
                    preferred_element_type=compute,
                    precision=jax.lax.Precision.HIGHEST)
    gy = jnp.einsum("hv,...vx->...hx", dh, x,
                    preferred_element_type=compute,
                    precision=jax.lax.Precision.HIGHEST)
    return gx.astype(images.dtype), gy.astype(images.dtype)
