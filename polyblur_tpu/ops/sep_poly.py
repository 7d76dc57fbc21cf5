"""Spectral polynomial deconvolution with parametric kernels — the TPU hot
path behind the reference's ``method='direct_separable'`` surface.

The estimator's sampled anisotropic Gaussian kernel

    k[t, j] = exp(-0.5 (a t^2 + 2 b t j + c j^2)) / N,   t, j in [-half, half]

is centrally symmetric, so its OTF on the padded canvas — ``p2o`` of the
kernel, filters.py:255 — is REAL and ANALYTIC in the quadratic form
(a, b, c): two tiny matmuls produce K_hat, and the whole degree-3
polynomial is DIAGONAL in the 2D DFT domain of the replicate-padded tile:

    p(K) u = idft2( p(K_hat) * dft2(u_padded) ),
    p(z)   = ((a3 z + a2) z + a1) z + beta.

This is EXACTLY the reference's fft method (deblurring.py:141-169) — the
same circular canvas, the same sampled-kernel spectrum — evaluated as MXU
matmul DFTs inside Pallas kernels on TPU (ops/pallas/sep_poly_fused.py) and
as ``rfft2`` elsewhere. No approximation error of any kind beyond f32
round-off.

Design history: rounds 2-3 used a sheared-axis separable factorization
(K = unshear . conv_y . conv_x . shear) with an ideal phase-ramp shear.
That operator's only remaining error — band-limited interpolation of the
FRACTIONALLY-SHIFTED narrow x-Gaussian's integer samples (the estimator's
rho clamp floor is 0.3 px, far below Nyquist-safe) — measured ~58 dB per
application at rho ~ 0.4, and the pipeline's global-max gradient statistic
amplified that feedback into per-iteration estimate drift worth
0.13-0.22 dB of restoration strength vs the reference. The exact spectrum
costs ~6 packed matmuls per application vs the shear chain's 5 on a
SMALLER canvas (no shear margin, no orientation transpose, no square
working frame), and removes the corner-wrap caveat, the |s| clamp, and the
margin-fitting machinery entirely.

Boundary semantics now match the reference fft method exactly: replicate
pad by half the support, circular beyond that (p2o wraps).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


__all__ = ["compute_polynomial_separable", "spectral_blur",
           "gaussian_quadratic_coeffs", "kernel_spectrum"]

# Largest canvas edge (rows or columns, incl. the fused replicate pad) for
# which the single-program fused Pallas kernel keeps its canvas, packed
# spectra and DFT tables VMEM-resident — admits a MEGA_MAX_TILE whole
# image plus the 2*12 prepad (single source of truth: envelopes.py).
from ..envelopes import (FUSED_MAX_CANVAS as _FUSED_MAX_CANVAS,
                         BLOCK_COST_CONST as _BLOCK_COST_CONST)


def _fused_path_eligible(h: int, w: int, prepad: bool,
                         backend: str | None = None, half: int = 12) -> bool:
    """Whether the single-program fused Pallas kernel can run this shape.

    With ``prepad`` the kernel replicate-pads internally by the half
    support, growing the VMEM-resident canvas by 2*half on both axes — the
    guard must account for that or the buffers overflow VMEM.
    """
    if backend is None:
        backend = jax.default_backend()
    if backend != "tpu":
        return False
    pad = 2 * half if prepad else 0
    return max(h, w) + pad <= _FUSED_MAX_CANVAS


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


def kernel_spectrum(a, b, c, h: int, w: int, half: int = 12) -> jnp.ndarray:
    """(N, h, w//2+1) real OTF of the sampled anisotropic Gaussian on the
    (h, w) circular canvas — ``p2o(batch_gaussian_kernels(...), (h, w))``
    evaluated analytically (the kernel is centrally symmetric, so the
    imaginary part is identically zero).

    Factorized: per row-offset j, the 1D tap row's x-spectrum H_j is a
    25-tap cosine/sine sum; the y-offset phases then combine the 2*half+1
    rows — O(half^2 (K + h)) instead of O(h w half^2).
    """
    t = jnp.arange(-half, half + 1, dtype=jnp.float32)
    af = a.astype(jnp.float32)[:, None, None]
    bf = b.astype(jnp.float32)[:, None, None]
    cf = c.astype(jnp.float32)[:, None, None]
    tx = t[None, None, :]
    ty = t[None, :, None]
    km = jnp.exp(-0.5 * (af * tx * tx + 2.0 * bf * tx * ty + cf * ty * ty))
    km = km / jnp.sum(km, axis=(-2, -1), keepdims=True)  # (N, j, t)
    K = w // 2 + 1
    wk = jnp.arange(K, dtype=jnp.float32)
    angx = (2.0 * math.pi / w) * t[:, None] * wk[None, :]  # (t, K)
    hr = jnp.einsum("njt,tk->njk", km, jnp.cos(angx))
    hi = -jnp.einsum("njt,tk->njk", km, jnp.sin(angx))
    q = jnp.arange(h, dtype=jnp.float32)
    angy = (2.0 * math.pi / h) * q[:, None] * t[None, :]   # (q, j)
    return (jnp.einsum("qj,njk->nqk", jnp.cos(angy), hr)
            + jnp.einsum("qj,njk->nqk", jnp.sin(angy), hi))


def _horner_spectrum(khat, horner):
    a3, a2, a1, beta = horner
    return ((a3 * khat + a2) * khat + a1) * khat + beta


def _spectral2d(x: jnp.ndarray, a, b, c, horner, half: int) -> jnp.ndarray:
    """p(K) on an (N, H, W) canvas batch — circular, exact.

    CPU route: ``rfft2`` / ``irfft2``. TPU route (training / ``prefer_xla``
    backward): the DFTs as explicit matmuls — XLA lowers non-power-of-two
    FFTs via Bluestein poorly while MXU matmuls are ~free; this is also the
    backward pass of the fused Pallas kernels (natively differentiable in
    x AND in (a, b, c) — the analytic spectrum is smooth in the quadratic
    form, so gradients flow to (sigma, rho, theta)).
    """
    n, h, w = x.shape
    dt = x.dtype
    qhat = _horner_spectrum(kernel_spectrum(a, b, c, h, w, half), horner)
    if jax.default_backend() == "tpu":
        from .pallas.sep_poly_fused import (_dft_mats_np, _ydft_mats_np,
                                            f32_dot_mode)

        cfm, sfm, ai, bi = (jnp.asarray(m) for m in _dft_mats_np(w))
        cy, sy = (jnp.asarray(m) for m in _ydft_mats_np(h))
        # XLA supports Precision.HIGH (bf16x3) natively — the same
        # compensated product the Pallas kernels write out by hand.
        hi = (jax.lax.Precision.HIGH
              if f32_dot_mode() == "compensated"
              else jax.lax.Precision.HIGHEST)
        xf = x.astype(jnp.float32)
        re = jnp.einsum("nhw,wk->nhk", xf, cfm, precision=hi)
        im = -jnp.einsum("nhw,wk->nhk", xf, sfm, precision=hi)
        re2 = (jnp.einsum("qy,nyk->nqk", cy, re, precision=hi)
               + jnp.einsum("qy,nyk->nqk", sy, im, precision=hi))
        im2 = (jnp.einsum("qy,nyk->nqk", cy, im, precision=hi)
               - jnp.einsum("qy,nyk->nqk", sy, re, precision=hi))
        pr = qhat * re2 * (1.0 / h)
        pi = qhat * im2 * (1.0 / h)
        re3 = (jnp.einsum("yq,nqk->nyk", cy.T, pr, precision=hi)
               - jnp.einsum("yq,nqk->nyk", sy.T, pi, precision=hi))
        im3 = (jnp.einsum("yq,nqk->nyk", cy.T, pi, precision=hi)
               + jnp.einsum("yq,nqk->nyk", sy.T, pr, precision=hi))
        out = (jnp.einsum("nyk,kw->nyw", re3, ai, precision=hi)
               + jnp.einsum("nyk,kw->nyw", im3, bi, precision=hi))
        return out.astype(dt)
    X = jnp.fft.rfft2(x.astype(jnp.float32))
    return jnp.fft.irfft2(qhat * X, s=(h, w)).astype(dt)


def compute_polynomial_separable(img: jnp.ndarray, sigma, rho, theta,
                                 alpha, beta,
                                 prepad: bool = False,
                                 clip: bool = False,
                                 ker_size: int = 25,
                                 prefer_xla: bool = False) -> jnp.ndarray:
    """Degree-3 polynomial deconvolution with per-sample Gaussian params.

    :param img: (B, C, H, W) tile batch. With ``prepad`` the replicate
        padding by the kernel half-support (utils.pad_with_kernel
        semantics) and the final crop are fused in here (one copy pass
        instead of three); otherwise the caller has padded already.
    :param sigma, rho, theta: (B, C) or (B, 1) per-sample blur parameters
    :param alpha, beta: scalar (or traced) polynomial gains
    :param ker_size: static tap support (reference ker_size surface,
        deblurring.py:23); the analytic spectrum samples exactly the
        ker_size x ker_size kernel the estimator would build.
    :return: same shape as ``img``

    Spectra and accumulations are f32 regardless of image dtype. The
    result equals ``compute_polynomial_fft`` with the estimator's 2D
    kernel to f32 round-off on every (sigma, rho, theta) — the two
    backends are the same operator, evaluated by FFT or by MXU matmuls.
    """
    a3 = (alpha / 2.0 - beta + 2.0)
    a2 = (3.0 * beta - alpha - 6.0)
    a1 = (5.0 - 3.0 * beta + alpha / 2.0)
    return _apply_param_operator(img, sigma, rho, theta, (a3, a2, a1, beta),
                                 prepad=prepad, clip=clip, ker_size=ker_size,
                                 prefer_xla=prefer_xla)


def spectral_blur(img: jnp.ndarray, sigma, rho, theta, ker_size: int = 25,
                  prefer_xla: bool = False) -> jnp.ndarray:
    """One application of the sampled-kernel blur K — circular convolution
    with the estimator's 2D kernel on the given canvas, i.e. exactly the
    reference's ``convolve2d(img, kernel, method='fft')``
    (filters.py:14-37). Used by the edgetaper blend for parametric
    kernels. Degree-1 spectrum: p(z) = z."""
    return _apply_param_operator(img, sigma, rho, theta,
                                 (0.0, 0.0, 1.0, 0.0),
                                 prepad=False, clip=False, ker_size=ker_size,
                                 prefer_xla=prefer_xla)


def _apply_param_operator(img, sigma, rho, theta, horner,
                          prepad: bool, clip: bool, ker_size: int,
                          prefer_xla: bool) -> jnp.ndarray:
    """Shared routing for spectrum-diagonal parametric operators: the
    fused Pallas kernel when the canvas fits VMEM, the blocked
    overlap-save route for larger TPU canvases, the XLA composition
    elsewhere (and for autodiff)."""
    from ..utils.profiling import record_dispatch

    if sigma.ndim != 2:
        raise ValueError("sigma/rho/theta must be (B, C') arrays")
    bsz, csz, h, w = img.shape
    half = ker_size // 2
    if half > 15:
        raise ValueError("ker_size > 31 exceeds the kernel tap tables")
    use_fused = (not prefer_xla
                 and _fused_path_eligible(h, w, prepad, half=half))
    if prepad and not use_fused:
        record_dispatch("compute_polynomial_separable", "xla_sep/prepad")
        # The fused kernel (which folds the replicate pad in) won't run —
        # either off-TPU or too large for VMEM. Apply pad_with_kernel
        # semantics explicitly around the spectral composition.
        out = _apply_param_operator(
            jnp.pad(img, [(0, 0), (0, 0), (half, half), (half, half)],
                    mode="edge"),
            sigma, rho, theta, horner, prepad=False, clip=False,
            ker_size=ker_size, prefer_xla=prefer_xla)
        out = out[..., half:-half, half:-half]
        return jnp.clip(out, 0.0, 1.0) if clip else out
    if sigma.shape[1] != csz:
        sigma = jnp.broadcast_to(sigma, (bsz, csz))
        rho = jnp.broadcast_to(rho, (bsz, csz))
        theta = jnp.broadcast_to(theta, (bsz, csz))
    a, b, c = gaussian_quadratic_coeffs(
        sigma.reshape(-1).astype(jnp.float32),
        rho.reshape(-1).astype(jnp.float32),
        theta.reshape(-1).astype(jnp.float32))
    n = bsz * csz
    x = img.reshape(n, h, w)
    a3, a2, a1, beta = horner

    if use_fused:
        # One fused VMEM-resident Pallas program per (tile, channel); the
        # kernel spectrum is rebuilt analytically in VMEM from 3 scalars
        # per tile.
        from .pallas.sep_poly_fused import fused_polynomial_pallas

        record_dispatch("compute_polynomial_separable", "pallas_fused")
        params = jnp.stack([a, b, c], axis=-1)
        coeffs = jnp.stack([jnp.asarray(v, jnp.float32)
                            for v in (a3, a2, a1, beta)])
        out = fused_polynomial_pallas(x, params, coeffs, prepad, False,
                                      half=half)
        out = out.reshape(bsz, csz, h, w)
        return jnp.clip(out, 0.0, 1.0) if clip else out

    if jax.default_backend() == "tpu" and not prefer_xla:
        # Block-grid fused route: any-size whole images through the same
        # VMEM-resident kernel via exact overlap-save blocking (the
        # operator's reach is 3*half, so apron blocks cut from the
        # wrap-extended canvas reproduce the circular whole-canvas result
        # bit-for-bit on block interiors).
        record_dispatch("compute_polynomial_separable", "pallas_blocked")
        out = _blocked_polynomial(x, a, b, c, (a3, a2, a1, beta), half)
        out = out.reshape(bsz, csz, h, w)
        return jnp.clip(out, 0.0, 1.0) if clip else out

    record_dispatch("compute_polynomial_separable", "xla_sep")
    out = _spectral2d(x, a, b, c, (a3, a2, a1, beta), half)
    out = out.reshape(bsz, csz, h, w)
    return jnp.clip(out, 0.0, 1.0) if clip else out


def _plan_block_grid(h: int, w: int, ap: int, cap: int = _FUSED_MAX_CANVAS,
                     block: int | None = None):
    """(th, b0h, tw, b0w) block grid for :func:`_blocked_polynomial`.

    Per-axis candidates are t blocks of b0 = ceil(dim / t) (b0 >= 2*ap,
    the _split_axis overlap rule; canvas b0 + 2*ap <= cap, the VMEM
    envelope). The joint choice minimizes the modeled kernel cost

        th*tw * ch8*cw128 * (ch8 + cw128 + _BLOCK_COST_CONST)

    where ch8/cw128 are the canvas edges rounded up to the (8, 128)
    Mosaic tile — per-pixel DFT cost grows with ch + cw, and lane/sublane
    padding is physically materialized, so a 430px canvas really costs
    512 lanes. ``block`` overrides with a fixed square block (tests)."""
    def axis_candidates(dim):
        if block is not None:
            b0 = max(block, 2 * ap)
            if b0 + 2 * ap > cap:
                raise ValueError(
                    f"block override {block} builds a {b0 + 2 * ap}px "
                    f"canvas past the VMEM envelope cap {cap}")
            return [(-(-dim // b0), b0)]
        cands = []
        t = 1
        while True:
            b0 = max(-(-dim // t), 2 * ap)
            if b0 + 2 * ap <= cap:
                cands.append((t, b0))
            if b0 == 2 * ap:
                break
            t += 1
        if not cands:
            raise ValueError(f"axis {dim} has no blocked plan under "
                             f"canvas cap {cap} (apron {ap})")
        return cands

    best = None
    for th, b0h in axis_candidates(h):
        ch = -(-(b0h + 2 * ap) // 8) * 8
        for tw, b0w in axis_candidates(w):
            cw = -(-(b0w + 2 * ap) // 128) * 128
            cost = th * tw * ch * cw * (ch + cw + _BLOCK_COST_CONST)
            if best is None or cost < best[0]:
                best = (cost, th, b0h, tw, b0w)
    return best[1:]


def _blocked_polynomial(x: jnp.ndarray, a, b, c, horner, half: int,
                        block: int | None = None,
                        interpret: bool = False) -> jnp.ndarray:
    """p(K) on an arbitrarily large (N, H, W) canvas batch via a 2D block
    grid of the per-tile fused kernel — exact overlap-save.

    The whole-canvas operator is circular convolution with a kernel of
    one-sided reach 3*half (three applications of half-support taps), so a
    block whose apron of 3*half true-content pixels comes from the
    WRAP-EXTENDED canvas reproduces the whole-canvas result exactly on its
    core: the block's own circular wrap only contaminates the apron ring.
    Extraction and reassembly are pure reshape decompositions
    (patches._split_axis) — no gather chains; the per-block canvases are
    the only operator-sized buffers anywhere (VMEM-resident). The block
    grid is planned per shape (:func:`_plan_block_grid`): rectangular
    per-axis blocks sized to minimize padded canvas area x per-pixel DFT
    cost (a 700px image runs 2x2 blocks of 430px canvas instead of
    round 3's fixed 448px blocks at 528px canvas — ~1.8x less modeled
    work).

    :param x: (N, H, W) canvas batch (rectangles fine)
    :param a, b, c: (N,) per-sample quadratic-form scalars
    :param horner: (a3, a2, a1, beta) scalars
    """
    from ..patches import _split_axis
    from .pallas.sep_poly_fused import fused_polynomial_pallas

    n, h, w = x.shape
    ap = 3 * half + 4  # operator reach, +4 sublane-alignment slack
    th, b0h, tw, b0w = _plan_block_grid(h, w, ap, block=block)
    # wrap-extend by the apron (the canvas circle's own content), then
    # zero-pad out to the block grid (those cores are cropped at the end)
    xw = jnp.pad(x, [(0, 0), (ap, ap), (ap, ap)], mode="wrap")
    xw = jnp.pad(xw, [(0, 0), (0, th * b0h - h), (0, tw * b0w - w)])
    rows = _split_axis(xw, th, b0h, b0h + 2 * ap, axis=1)     # (Th,N,bh,W')
    tiles = _split_axis(rows, tw, b0w, b0w + 2 * ap, axis=3)  # (Tw,Th,N,bh,bw)
    bh, bw = b0h + 2 * ap, b0w + 2 * ap
    blocks = tiles.reshape(tw * th * n, bh, bw)

    reps = tw * th
    params = jnp.tile(jnp.stack([a, b, c], axis=-1), (reps, 1))
    coeffs = jnp.stack([jnp.asarray(v, jnp.float32) for v in horner])

    out = fused_polynomial_pallas(blocks, params, coeffs, False, False,
                                  interpret, half)
    out = out.reshape(tw, th, n, bh, bw)[:, :, :, ap:ap + b0h, ap:ap + b0w]
    # (Tw, Th, N, b0h, b0w) -> (N, Th*b0h, Tw*b0w)
    out = out.transpose(2, 1, 3, 0, 4).reshape(n, th * b0h, tw * b0w)
    return out[:, :h, :w]
