"""Bilateral filter (edge-aware smoothing used as prefilter).

TPU-native rewrite of /root/reference/polyblur/filters.py:107-148. The
reference shift-and-accumulates ksize^2 shifted copies; here the shifts are
static slices of one replicate-padded buffer, so XLA fuses the whole filter
into a single VPU loop nest (no unfold/gather). On TPU, VMEM-sized planes
dispatch to the Pallas kernel in ops/pallas/bilateral.py (one HBM read +
write per plane); larger inputs use the XLA composition below.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.imaging import pad_with_kernel

__all__ = ["bilateral_filter"]


def _bilateral_xla(img: jnp.ndarray, ksize: int, sigma_spatial: float,
                   sigma_color: float) -> jnp.ndarray:
    h, w = img.shape[-2:]
    t = np.arange(-ksize // 2 + 1, ksize // 2 + 1)
    gw = np.exp(-(t[None, :] ** 2 + t[:, None] ** 2)
                / (2.0 * sigma_spatial * sigma_spatial))
    padded = pad_with_kernel(img, ksize=ksize)
    inv_var2 = 1.0 / (2.0 * sigma_color * sigma_color)

    num = jnp.zeros_like(img)
    den = jnp.zeros_like(img)
    for dy in range(ksize):
        for dx in range(ksize):
            shifted = padded[..., dy:dy + h, dx:dx + w]
            d = shifted - img
            f = jnp.exp(-d * d * inv_var2) * jnp.asarray(gw[dy, dx], img.dtype)
            num = num + f * shifted
            den = den + f
    return num / (den + 1e-5)


def bilateral_filter(img: jnp.ndarray, ksize: int = 5,
                     sigma_spatial: float = 5.0,
                     sigma_color: float = 0.1) -> jnp.ndarray:
    """Edge-preserving smoothing: ``J = sum_s w_s(I) I_s / sum_s w_s(I)``.

    :param img: (B, C, H, W)
    :return: (B, C, H, W) smoothed image

    Matches the reference's spatial grid ``t = arange(-ksize//2+1,
    ksize//2+1)`` (filters.py:109), color weights ``exp(-d^2 / 2 sigma_c^2)``
    and the 1e-5 normalization guard (filters.py:148).
    """
    from ..utils.profiling import record_dispatch
    from .pallas.bilateral import bilateral_pallas, pallas_bilateral_eligible

    h, w = img.shape[-2:]
    if pallas_bilateral_eligible(h, w):
        record_dispatch("bilateral_filter", "pallas")
        return bilateral_pallas(img, ksize, sigma_spatial, sigma_color)
    record_dispatch("bilateral_filter", "xla")
    return _bilateral_xla(img, ksize, sigma_spatial, sigma_color)
