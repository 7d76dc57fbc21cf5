"""Parametric anisotropic Gaussian kernels.

TPU-native rewrites of the reference kernel builders:
  * batched inverse-covariance kernels used by the estimator
    (/root/reference/polyblur/blur_estimation.py:189-232)
  * the NumPy synthesis kernel used for calibration / synthetic degradation
    (/root/reference/polyblur/filters.py:198-245)

The blur model is a zero-mean 2D Gaussian with std ``sigma`` along direction
``theta`` and std ``rho`` orthogonal to it.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "inverse_covariance",
    "batch_gaussian_kernels",
    "gaussian_filter_np",
    "dirac",
]


def inverse_covariance(sigmas, rhos, thetas):
    """Entries of the 2x2 inverse covariance for (sigma, rho, theta) batches.

    Matches blur_estimation.py:189-208 (note the reference negates theta).
    Returns (inv00, inv01, inv11), each with the broadcast shape of inputs.
    """
    thetas = -thetas
    c = jnp.cos(thetas)
    s = jnp.sin(thetas)
    cc, ss, sc = c * c, s * s, s * c
    inv_l1 = 1.0 / (sigmas * sigmas)
    inv_l2 = 1.0 / (rhos * rhos)
    inv00 = cc * inv_l1 + ss * inv_l2
    inv01 = sc * (inv_l1 - inv_l2)
    inv11 = cc * inv_l2 + ss * inv_l1
    return inv00, inv01, inv11


def batch_gaussian_kernels(thetas, sigmas, rhos, ksize: int) -> jnp.ndarray:
    """Normalized (B, 1, ksize, ksize) anisotropic Gaussian kernels.

    Vectorized quadratic-form evaluation of blur_estimation.py:211-232:
    ``k(x) = exp(-0.5 * x^T SIGMA^{-1} x)`` on a centered integer grid,
    normalized to unit mass.

    :param thetas, sigmas, rhos: (B, 1) arrays (radians / pixels)
    """
    inv00, inv01, inv11 = inverse_covariance(sigmas, rhos, thetas)
    b = sigmas.shape[0]
    t = (jnp.arange(ksize) - (ksize - 1) // 2).astype(sigmas.dtype)
    X, Y = jnp.meshgrid(t, t, indexing="xy")  # (k, k)
    X = X[None, None]
    Y = Y[None, None]
    inv00 = inv00.reshape(b, 1, 1, 1)
    inv01 = inv01.reshape(b, 1, 1, 1)
    inv11 = inv11.reshape(b, 1, 1, 1)
    q = inv00 * X * X + 2.0 * inv01 * X * Y + inv11 * Y * Y
    kernels = jnp.exp(-0.5 * q)
    return kernels / jnp.sum(kernels, axis=(-2, -1), keepdims=True)


def gaussian_filter_np(sigma, theta, shift=(0.0, 0.0), k_size=(15, 15)) -> np.ndarray:
    """NumPy anisotropic Gaussian kernel for synthesis and calibration.

    Matches filters.py:198-234 including the degenerate-kernel fallback to a
    centered dirac when the mass drops below 1e-2 (a behavioral guard, see
    SURVEY.md section 5.3).

    :param sigma: pair (std along theta, std orthogonal)
    :param theta: rotation angle in radians
    """
    shift = np.asarray(shift, dtype=np.float64)
    k_size = np.asarray(k_size, dtype=np.int64)
    lambda_1, lambda_2 = float(sigma[0]), float(sigma[1])
    theta = -float(theta)

    LAMBDA = np.diag([lambda_1**2, lambda_2**2])
    Q = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    SIGMA = Q @ LAMBDA @ Q.T
    INV_SIGMA = np.linalg.inv(SIGMA)

    MU = (k_size // 2 - shift).astype(np.float64)
    X, Y = np.meshgrid(range(int(k_size[0])), range(int(k_size[1])))
    Z = np.stack([X, Y], axis=-1).astype(np.float64) - MU
    q = (
        INV_SIGMA[0, 0] * Z[..., 0] ** 2
        + 2.0 * INV_SIGMA[0, 1] * Z[..., 0] * Z[..., 1]
        + INV_SIGMA[1, 1] * Z[..., 1] ** 2
    )
    raw = np.exp(-0.5 * q).astype(np.float32)

    if raw.sum() < 1e-2:
        kernel = np.zeros_like(raw)
        kernel[int(k_size[0]) // 2, int(k_size[1]) // 2] = 1.0
        return kernel
    return raw / raw.sum()


def dirac(dims) -> np.ndarray:
    """Centered dirac kernel (filters.py:237-245)."""
    kernel = np.zeros(tuple(dims), dtype=np.float32)
    kernel[dims[0] // 2, dims[1] // 2] = 1.0
    return kernel
