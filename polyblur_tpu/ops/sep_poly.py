"""Shear-factorized separable polynomial deconvolution — the TPU hot path.

Replaces the FFT polynomial filter (restoration.compute_polynomial_fft) and
the grouped direct convolution with pure MXU work. The anisotropic Gaussian
kernel exp(-0.5 (a x^2 + 2 b xy + c y^2)) factorizes exactly as

    K = unshear_s . conv_y(c')  . conv_x(a) . shear_s,
    s = -b / a,   c' = c - b^2 / a

(sheared-axis separability; same decomposition as the reference's native
oriented-convolution kernel, separable_gaussian2d.cpp:91-183). The shear
commutes with every per-row operation, so the *entire* degree-3 polynomial
p(K) collapses to ONE shear pair around a Horner chain of per-tile band-
matrix matmuls:

    p(K) u = unshear_s( Horner_{X,V}( shear_s(u) ) )

where X, V are banded Toeplitz matrices of the 1D Gaussian taps. Band
matrices are materialized dense — on the MXU the dense (Wc x Wc) matmul is
far cheaper than any gather-based sparse alternative, and one X (or V)
application over the whole tile batch is a single large batched matmul.

Trade-off vs the reference direct path: the 25-tap truncation window is a
sheared parallelogram instead of a square (exactly like the reference's
own xt C++ path), and |s| is clamped to ``smax`` (extreme anisotropy at
~45 deg is slightly rounded). Interior agreement with the exact direct
path is tested to ~1e-3.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .shear import shear_rows

__all__ = ["compute_polynomial_separable", "gaussian_quadratic_coeffs"]

_HALF = 12  # fixed 25-tap support, matching ker_size=25 (deblurring.py:23)

# Largest per-program edge (rows or canvas columns) for which the fused
# Pallas kernel's two band operators + canvas stay VMEM-resident.
_FUSED_MAX_EDGE = 640


def _canvas_width(w: int, margin: int) -> int:
    """Shear canvas width: image + shear margins, rounded up to 8 lanes."""
    return int((w + 2 * margin + 7) // 8 * 8)


def _fused_path_eligible(h: int, w: int, margin: int, prepad: bool,
                         backend: str | None = None) -> bool:
    """Whether the single-program fused Pallas kernel can run this shape.

    With ``prepad`` the kernel replicate-pads internally by the half
    support, growing the VMEM-resident canvas by 2*HALF on both axes — the
    guard must account for that or the operators overflow VMEM.
    """
    if backend is None:
        backend = jax.default_backend()
    if backend != "tpu":
        return False
    pad = 2 * _HALF if prepad else 0
    return max(h + pad, _canvas_width(w + pad, margin)) <= _FUSED_MAX_EDGE


def gaussian_quadratic_coeffs(sigma, rho, theta):
    """(a, b, c) of the kernel's quadratic form, from (sigma, rho, theta).

    Matches the inverse covariance of blur_estimation.py:189-208 (note the
    reference negates theta): a multiplies x^2 (columns), c multiplies y^2
    (rows), b the cross term.
    """
    t = -theta
    ct = jnp.cos(t)
    st = jnp.sin(t)
    inv_l1 = 1.0 / (sigma * sigma)
    inv_l2 = 1.0 / (rho * rho)
    a = ct * ct * inv_l1 + st * st * inv_l2
    b = st * ct * (inv_l1 - inv_l2)
    c = ct * ct * inv_l2 + st * st * inv_l1
    return a, b, c


def _gauss_taps(coef, dtype):
    """L1-normalized 25 taps of exp(-0.5 * coef * t^2). coef: (N,)."""
    t = jnp.arange(-_HALF, _HALF + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * coef[:, None] * (t * t)[None, :])
    return (k / jnp.sum(k, axis=-1, keepdims=True)).astype(dtype)


def _tap_inv_norm(coef):
    """1 / sum of the RAW (unnormalized) 25 Gaussian taps. coef: (N,)."""
    t = jnp.arange(-_HALF, _HALF + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * coef[:, None] * (t * t)[None, :])
    return 1.0 / jnp.sum(k, axis=-1)


def _band_matrix(taps: jnp.ndarray, n: int) -> jnp.ndarray:
    """(N, n, n) 'same' convolution operators from (N, 25) taps.

    M[i, u, v] = taps[i, u - v + HALF] for |u - v| <= HALF else 0;
    out[u] = sum_v M[u, v] in[v]. (Gaussian taps are symmetric, so
    correlation == convolution.)

    Built with the Toeplitz pad-and-reshape trick — one broadcast + one
    reshape, no gathers (an elementwise gather over n^2 indices costs ~5x
    the whole matmul that consumes the matrix on TPU): tiling the row
    template [t_24..t_0, 0 x (n-24)] of length n+1 then dropping the last
    column slides the taps one column per row, i.e. lays them on the
    diagonals.
    """
    m = taps.shape[0]
    wide = n + _HALF  # build width n + 12, crop the first 12 columns
    L = wide + 1
    # row template: reversed taps then zeros, length L; tiling n rows and
    # dropping one column per row yields T[r, v'] = tmpl[(v' - r) mod L],
    # i.e. the taps slide one column right per row.
    tmpl = jnp.concatenate(
        [taps[:, ::-1], jnp.zeros((m, L - (2 * _HALF + 1)), taps.dtype)],
        axis=1)  # (N, L)
    full = jnp.broadcast_to(tmpl[:, None, :], (m, n, L))
    full = full.reshape(m, n * L)[:, : n * wide].reshape(m, n, wide)
    # M[u, v] = taps_rev[v - (u - HALF)] = T[u, v + HALF]
    return full[:, :, _HALF:]


def compute_polynomial_separable(img: jnp.ndarray, sigma, rho, theta,
                                 alpha, beta, smax: float = 1.5,
                                 prepad: bool = False,
                                 clip: bool = False) -> jnp.ndarray:
    """Degree-3 polynomial deconvolution with per-sample Gaussian params.

    :param img: (B, C, H, W) tile batch. With ``prepad`` the replicate
        padding by the kernel half-support (utils.pad_with_kernel
        semantics) and the final crop are fused in here (one copy pass
        instead of three); otherwise the caller has padded already.
    :param sigma, rho, theta: (B, C) or (B, 1) per-sample blur parameters
    :param alpha, beta: scalar (or traced) polynomial gains
    :return: same shape as ``img``

    Matmuls accumulate in f32 regardless of image dtype. ``smax`` clamps
    the shear slope; 1.5 keeps every kernel in the reference's calibrated
    anisotropy range (rho/sigma in [0.33, 1], calibrate_blur_parameters.py
    :209) exact at any angle, with a minimal canvas.

    Beyond the calibrated range the estimator's independent clamps
    (sigma, rho in [0.3, 4], blur_estimation.py:179-183) allow ratios down
    to 0.075, where the true slope |s| reaches ~6.6 near axis-aligned
    angles and the clamp engages (ADVICE r1). Measured against the exact
    direct-convolution oracle (interior PSNR, peacock content):

    * calibrated range (|s| <= ~1.4): 63-85 dB — exact, any smax;
    * moderately past the clamp (|s| ~ 1.5-1.7): smax=1.5 costs accuracy
      (35-46 dB, vs 60-81 dB at smax=2.5) — widening helps here, at a
      ~5% canvas-size cost;
    * extreme slopes (|s| >= ~4.8): the clamp is protective — smax=1.5
      agrees at 33-34 dB while an unclamped run degrades to 25-28 dB
      (long sheared cubic sampling breaks down faster than the rounder
      clamped kernel deviates).

    The 1.5 default keeps the calibrated range exact with the smallest
    canvas; pass a larger smax if inputs routinely land in the 1.5-2.5
    slope band, or route extreme-anisotropy inputs to method='fft' /
    'direct'. Pinned by tests/test_kernels.py::
    test_smax_clamp_extremes_bounded.
    """
    from ..utils.profiling import record_dispatch

    bsz, csz, h, w = img.shape
    margin = int(math.ceil(_HALF * smax))
    use_fused = _fused_path_eligible(h, w, margin, prepad)
    record_dispatch("compute_polynomial_separable",
                    "pallas_fused" if use_fused
                    else ("xla_band/prepad" if prepad else "xla_band"))
    if prepad and not use_fused:
        # The fused kernel (which folds the replicate pad in) won't run —
        # either off-TPU or too large for VMEM. Apply pad_with_kernel
        # semantics explicitly around the XLA composition; without this,
        # large TPU images got zero-canvas borders instead of edge
        # replication (ADVICE r1, medium).
        out = compute_polynomial_separable(
            jnp.pad(img, [(0, 0), (0, 0), (_HALF, _HALF), (_HALF, _HALF)],
                    mode="edge"),
            sigma, rho, theta, alpha, beta, smax=smax, prepad=False)
        out = out[..., _HALF:-_HALF, _HALF:-_HALF]
        return jnp.clip(out, 0.0, 1.0) if clip else out
    if sigma.ndim != 2:
        raise ValueError("sigma/rho/theta must be (B, C') arrays")
    if sigma.shape[1] != csz:
        sigma = jnp.broadcast_to(sigma, (bsz, csz))
        rho = jnp.broadcast_to(rho, (bsz, csz))
        theta = jnp.broadcast_to(theta, (bsz, csz))
    a, b, c = gaussian_quadratic_coeffs(
        sigma.reshape(-1).astype(jnp.float32),
        rho.reshape(-1).astype(jnp.float32),
        theta.reshape(-1).astype(jnp.float32))
    n = bsz * csz

    s = jnp.clip(-b / a, -smax, smax)
    c_prime = jnp.maximum(c - (b * b) / a, 1e-4)

    # canvas: sheared-line sampling reaches at most HALF * smax columns
    wc = _canvas_width(w, margin)
    pad_l = (wc - w) // 2

    dt = img.dtype

    a3 = (alpha / 2.0 - beta + 2.0)
    a2 = (3.0 * beta - alpha - 6.0)
    a1 = (5.0 - 3.0 * beta + alpha / 2.0)

    # p(K)u = beta*u + Ush( V (a1 w + X V (a2 w + X V (a3 w))) ),
    # w = Sh(X u). Both interpolating transforms act on Gaussian-smoothed
    # content (X u going in, V...-smoothed coming out) and the identity
    # term bypasses interpolation entirely — this kills the double-
    # interpolation error of the naive Sh . Horner . Ush ordering.
    if use_fused:
        # One fused VMEM-resident Pallas program per (tile, channel); the
        # band operators are rebuilt analytically in VMEM from 5 scalars
        # per tile (materializing them in HBM costs more than the matmuls
        # that consume them). Whole images beyond tile scale use the XLA
        # composition below (band operators don't fit VMEM).
        from .pallas.sep_poly_fused import fused_polynomial_pallas

        inv_nx = _tap_inv_norm(a)
        inv_nv = _tap_inv_norm(c_prime)
        params = jnp.stack([s, a, c_prime, inv_nx, inv_nv], axis=-1)
        coeffs = jnp.stack([jnp.asarray(v, jnp.float32)
                            for v in (a3, a2, a1, beta)])
        out = fused_polynomial_pallas(img.reshape(n, h, w), params, coeffs,
                                      margin, prepad, clip)
        return out.reshape(bsz, csz, h, w)

    xmat = _band_matrix(_gauss_taps(a, dt), wc)        # (N, Wc, Wc)
    vmat = _band_matrix(_gauss_taps(c_prime, dt), h)   # (N, H, H)

    # Band matrices are symmetric (Gaussian taps), so the natural
    # contraction layouts below need no operand transpose on the MXU.
    def xconv(u):
        return jnp.einsum("nhv,nvu->nhu", u, xmat,
                          preferred_element_type=jnp.float32).astype(dt)

    def vconv(u):
        return jnp.einsum("nyz,nzw->nyw", vmat, u,
                          preferred_element_type=jnp.float32).astype(dt)

    x = jnp.zeros((n, h, wc), img.dtype)
    x = x.at[:, :, pad_l:pad_l + w].set(img.reshape(n, h, w))
    w_t = shear_rows(xconv(x), s)
    r = a3 * w_t
    r = a2 * w_t + xconv(vconv(r))
    r = a1 * w_t + xconv(vconv(r))
    out = beta * x + shear_rows(vconv(r), -s)
    out = out[:, :, pad_l:pad_l + w].reshape(bsz, csz, h, w)
    return jnp.clip(out, 0.0, 1.0) if clip else out
