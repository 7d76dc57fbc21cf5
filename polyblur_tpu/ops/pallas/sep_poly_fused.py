"""Fused Pallas kernel: the ENTIRE degree-3 polynomial deconvolution of one
tile — replicate pad, analytic kernel-spectrum build, six packed MXU DFT
matmuls, crop — in a single VMEM-resident program.

The operator (see ops/sep_poly.py) is the EXACT sampled-kernel polynomial,
diagonal in the 2D DFT of the replicate-padded tile:

    p(K) u = idft2( p(K_hat) * dft2(u_pad) )

evaluated as matmuls: a packed x-rDFT (one matmul produces the [re | im]
half-spectrum), two y-DFT matmuls (cos/sin row tables; complex rotation
via an aligned half-swap), the real spectrum multiply, two inverse y-DFT
matmuls, and the packed inverse x-rDFT. K_hat itself is rebuilt in VMEM
from the tile's THREE quadratic-form scalars via two tiny matmuls against
host-precomputed tap-phase tables — the (ker x ker) kernel never exists in
HBM.

Design history (each stage measured on v5e through the axon tunnel):
round 2 banded spatial matmuls on a margin canvas (~6.5 ms/application
unfused); round 3 spectral-x shear factorization with ideal phase ramps
(~112 us per 400^2 x 3ch x 3-iter tile, but band-limited interpolation of
the fractionally-shifted narrow x-taps cost ~58 dB per application vs the
exact operator); round 4 (this file) the exact 2D spectrum — one more
packed matmul per application than the shear chain, on a SMALLER canvas
(no shear margin), and f32-exact vs the reference fft method.

Gradients: the custom VJP differentiates the equivalent XLA composition
(rfft2 / DFT einsums — natively differentiable in x and in (a, b, c));
the Pallas kernel only runs forward.
"""

from __future__ import annotations

import contextlib
import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


__all__ = ["fused_polynomial_pallas"]


@functools.lru_cache(maxsize=8)
def _dft_mats_np(wc: int):
    """Real-DFT matrices along the lane (x) axis (host-precomputed; they
    depend only on the static canvas width, so every program reuses the
    same constant blocks). rfft: ``Re = z @ Cf``, ``Im = -(z @ Sf)``;
    irfft: ``z = Re @ Ai + Im @ Bi``. The v*k products are reduced mod wc
    exactly before the trig, so there is no large-argument precision
    loss."""
    K = wc // 2 + 1
    v = np.arange(wc)[:, None]
    k = np.arange(K)[None, :]
    ang = (2.0 * np.pi / wc) * np.mod(v * k, wc)
    cf = np.cos(ang).astype(np.float32)
    sf = np.sin(ang).astype(np.float32)
    ki = np.arange(K)[:, None]
    vi = np.arange(wc)[None, :]
    ang2 = (2.0 * np.pi / wc) * np.mod(ki * vi, wc)
    wk = np.where((ki == 0) | ((wc % 2 == 0) & (ki == wc // 2)),
                  1.0, 2.0) / wc
    ai = (wk * np.cos(ang2)).astype(np.float32)
    bi = (-wk * np.sin(ang2)).astype(np.float32)
    return cf, sf, ai, bi


@functools.lru_cache(maxsize=8)
def _ydft_mats_np(h: int):
    """Full-DFT cos/sin matrices along the row (y) axis: ``C[q, y] =
    cos(2 pi q y / h)``, ``S[q, y] = sin(...)`` (symmetric, so forward and
    inverse share them; the inverse's 1/h normalization is folded into the
    spectrum multiply)."""
    q = np.arange(h)[:, None]
    y = np.arange(h)[None, :]
    ang = (2.0 * np.pi / h) * np.mod(q * y, h)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _packed_k(wc: int) -> int:
    """Lane-padded half-spectrum width: K = wc//2+1 rounded up to 128."""
    return -(-(wc // 2 + 1) // 128) * 128


def _dft_operands_packed(wc: int, dtype):
    """Packed real-DFT blocks: forward F = [Cf | -Sf] (wc, 2 Kp) so one
    matmul yields the full (re | im) half-spectrum, and inverse
    G = [Ai ; Bi] (2 Kp, wc) so one matmul consumes it. K is lane-padded
    to Kp (a multiple of 128): the pad columns/rows are zero, so the
    (re | im) halves sit at aligned lane offsets and the mid-chain swap
    of the two halves is an aligned copy, never a lane relayout. Mosaic
    pads (., K) operands to the next 128 lanes internally anyway, so the
    explicit pad adds no FLOPs that weren't already spent.

    For bf16 images the DFT matmuls run in bf16 (f32 matmuls cost ~6x on
    the MXU); the induced error (~1e-3) sits at the same scale as the
    bf16 output quantization. f32 images keep f32 matrices."""
    cf, sf, ai, bi = _dft_mats_np(wc)
    K = wc // 2 + 1
    kp = _packed_k(wc)
    fwd = np.zeros((wc, 2 * kp), np.float32)
    fwd[:, :K] = cf
    fwd[:, kp:kp + K] = -sf
    inv = np.zeros((2 * kp, wc), np.float32)
    inv[:K, :] = ai
    inv[kp:kp + K, :] = bi
    mdt = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    return jnp.asarray(fwd, mdt), jnp.asarray(inv, mdt)


def _ydft_operands(h: int, dtype):
    mdt = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    cy, sy = _ydft_mats_np(h)
    return jnp.asarray(cy, mdt), jnp.asarray(sy, mdt)


def _tap_tables_np(h: int, wc: int, half: int):
    """Host tables for the in-VMEM analytic kernel-spectrum build.

    ``er/ei`` (128, Kp): row t (t < 2*half+1) is the x-phase
    cos/-sin(2 pi (t - half) k / wc) of tap offset t - half; rows beyond
    the support are zero. ``cyt/syt`` (h, 32): column j is the y-phase
    cos/sin(2 pi q (j - half) / h) of row offset j - half."""
    K = wc // 2 + 1
    kp = _packed_k(wc)
    taps = 2 * half + 1
    t = np.arange(taps)[:, None] - half
    k = np.arange(K)[None, :]
    er = np.zeros((128, kp), np.float32)
    ei = np.zeros((128, kp), np.float32)
    ang = (2.0 * np.pi / wc) * t * k
    er[:taps, :K] = np.cos(ang)
    ei[:taps, :K] = -np.sin(ang)
    q = np.arange(h)[:, None]
    j = np.arange(taps)[None, :] - half
    angy = (2.0 * np.pi / h) * q * j
    cyt = np.zeros((h, 32), np.float32)
    syt = np.zeros((h, 32), np.float32)
    cyt[:, :taps] = np.cos(angy)
    syt[:, :taps] = np.sin(angy)
    return er, ei, cyt, syt


#: f32 fast-path MXU dot mode. Mosaic's DEFAULT truncates f32 operands to
#: bf16 (measured 41.5 dB fast-vs-fft on the flagship — unacceptable);
#: the two usable modes are
#:   "compensated" — manual error-compensated bf16x3 split (the classic
#:       a_hi*b_hi + a_hi*b_lo + a_lo*b_hi; Mosaic rejects Precision.HIGH,
#:       so the split is written out): 3 native MXU passes per dot,
#:       dropped lo*lo term ~2^-18-relative per dot;
#:   "highest" — Precision.HIGHEST (6 bf16 passes, full f32 round-off).
#: Default "compensated": measured on hardware (docs/ROUND4_NOTES.md) and
#: still far above every parity gate; set_f32_dot_mode("highest") restores
#: full f32 round-off for newly compiled programs (already-jitted
#: callables keep the mode they traced with). bf16 images always run the
#: native single-pass MXU (output quantization dominates there).
_F32_DOT_MODE = "compensated"


def set_f32_dot_mode(mode: str) -> None:
    """Select the f32 fast-path dot mode: 'compensated' (default) or
    'highest'. Affects programs compiled after the call.

    CAVEAT (trace-time state): already-jitted callables keep the mode
    they traced with, and the global is not thread-safe. Prefer the
    scoped :func:`f32_dot_mode_scope` in tests and A/B probes — it
    restores the previous mode even on exceptions."""
    global _F32_DOT_MODE
    if mode not in ("compensated", "highest"):
        raise ValueError(f"unknown f32 dot mode {mode!r}; expected "
                         "'compensated' or 'highest'")
    _F32_DOT_MODE = mode


def f32_dot_mode() -> str:
    return _F32_DOT_MODE


@contextlib.contextmanager
def f32_dot_mode_scope(mode: str):
    """Context manager around :func:`set_f32_dot_mode`: sets ``mode`` for
    the dynamic extent of the block and always restores the previous
    mode. The same trace-time caveat applies inside the block (functions
    jitted BEFORE entering keep their traced mode)."""
    prev = _F32_DOT_MODE
    set_f32_dot_mode(mode)
    try:
        yield
    finally:
        set_f32_dot_mode(prev)


def _split_bf16(a):
    """(hi, lo) bf16 split of an f32 array: a ≈ hi + lo to ~2^-17."""
    ah = a.astype(jnp.bfloat16)
    return ah, (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)


def _mm_precision(mdt):
    """Dot precision for the spectral matmuls when NOT compensated (see
    :data:`_F32_DOT_MODE`)."""
    return (jax.lax.Precision.HIGHEST if mdt == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _kernel_spectrum_block(qa, qb, qc, er, ei, cyt, syt, half: int):
    """In-VMEM analytic OTF (h, Kp) from the tile's three quadratic-form
    scalars (matches ops.sep_poly.kernel_spectrum): build the sampled
    kernel as a (32, 128) masked block, two tiny matmuls against the tap
    phase tables, then the y-phase combine. Always f32/HIGHEST — the OTF
    feeds every downstream multiply and these matmuls are tiny."""
    hi = jax.lax.Precision.HIGHEST
    taps = 2 * half + 1
    jr = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 0)
    tl = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 1)
    mask = jnp.logical_and(jr < taps, tl < taps)
    jf = jr.astype(jnp.float32) - half
    tf = tl.astype(jnp.float32) - half
    km = jnp.where(
        mask, jnp.exp(-0.5 * (qa * tf * tf + 2.0 * qb * tf * jf
                              + qc * jf * jf)), 0.0)
    km = km * (1.0 / jnp.sum(km))
    hr = jax.lax.dot(km, er.astype(jnp.float32),
                     preferred_element_type=jnp.float32, precision=hi)
    hi_ = jax.lax.dot(km, ei.astype(jnp.float32),
                      preferred_element_type=jnp.float32, precision=hi)
    # cyt/syt are (h, 32) with the 2*half+1 active columns; hr/hi rows
    # beyond the tap support are zero, so the (h, 32) @ (32, Kp) pair
    # yields the (h, Kp) OTF directly.
    return (jax.lax.dot(cyt.astype(jnp.float32), hr,
                        preferred_element_type=jnp.float32, precision=hi)
            + jax.lax.dot(syt.astype(jnp.float32), hi_,
                          preferred_element_type=jnp.float32, precision=hi))


def _spectral_poly_block(xc, qhat2, fwd, invm, cy, sy, kp,
                         compensated=None):
    """One packed-spectral polynomial application on an (h, wc) f32 canvas
    block: p(K) xc with ``qhat2`` the packed [q | q] (h, 2 Kp) spectrum
    already scaled by 1/h (the inverse y-DFT normalization).

    ``fwd/invm/cy/sy`` may each be an array or a pre-split ``(hi, lo)``
    bf16 pair (see :func:`_split_bf16`) — callers that apply the operator
    many times per program hoist the constant-table splits.
    ``compensated`` overrides the f32 dot mode per call site (None =
    :data:`_F32_DOT_MODE`; pre-split tables force it on)."""
    pair = isinstance(fwd, tuple)
    mdt = (fwd[0] if pair else fwd).dtype
    if pair:
        compensated = True
        mdt = jnp.float32
    elif compensated is None:
        compensated = (mdt == jnp.float32
                       and _F32_DOT_MODE == "compensated")
    prec = _mm_precision(mdt)

    def pdot(a, b):
        if not compensated:
            return jax.lax.dot(a.astype(mdt), b.astype(mdt),
                               preferred_element_type=jnp.float32,
                               precision=prec)
        ah, al = a if isinstance(a, tuple) else _split_bf16(a)
        bh, bl = b if isinstance(b, tuple) else _split_bf16(b)

        def d(u, v):
            return jax.lax.dot(u, v, preferred_element_type=jnp.float32)

        # error-compensated bf16x3: dropped lo*lo term is ~2^-18-relative
        return d(ah, bh) + (d(ah, bl) + d(al, bh))

    sgn = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, 2 * kp), 1) < kp, 1.0, -1.0)

    def swap(u2):
        return jnp.concatenate([u2[:, kp:], u2[:, :kp]], axis=1)

    ri2 = pdot(xc, fwd)
    yf = pdot(cy, ri2) + pdot(sy, swap(ri2) * sgn)
    p2 = qhat2 * yf
    yi = pdot(cy, p2) + pdot(sy, swap(p2) * (-sgn))
    return pdot(yi, invm)


def _make_kernel(replicate_pad: bool, clip: bool, half: int):
    def kernel(p_ref, co_ref, x_ref, fwd_ref, inv_ref, cy_ref, sy_ref,
               er_ref, ei_ref, cyt_ref, syt_ref, out_ref):
        _, h_in, w_raw = x_ref.shape
        i = pl.program_id(0)
        qa = p_ref[i, 0]
        qb = p_ref[i, 1]
        qc = p_ref[i, 2]
        a3 = co_ref[0]
        a2 = co_ref[1]
        a1 = co_ref[2]
        beta = co_ref[3]

        xin = x_ref[0]  # (H, W) tile
        if replicate_pad:
            # replicate-pad rows and columns by the kernel half-support in
            # VMEM (pad_with_kernel semantics, utils.py:48-53)
            top = jnp.broadcast_to(xin[:1], (half, w_raw))
            bot = jnp.broadcast_to(xin[-1:], (half, w_raw))
            xin = jnp.concatenate([top, xin, bot], axis=0)
            left = jnp.broadcast_to(xin[:, :1], (xin.shape[0], half))
            right = jnp.broadcast_to(xin[:, -1:], (xin.shape[0], half))
            xin = jnp.concatenate([left, xin, right], axis=1)
        h = h_in + 2 * half if replicate_pad else h_in
        # The canvas IS the (padded) tile: the operator is circular on
        # exactly the reference fft method's p2o geometry — no margin.
        xf = xin.astype(jnp.float32)

        khat = _kernel_spectrum_block(qa, qb, qc, er_ref[...], ei_ref[...],
                                      cyt_ref[...], syt_ref[...], half)
        qhat = ((a3 * khat + a2) * khat + a1) * khat + beta
        qhat2 = jnp.concatenate([qhat, qhat], axis=1) * (1.0 / h)
        kp = er_ref.shape[1]
        # compensated=False: measured on v5e (docs/ROUND4_NOTES.md f32 dot
        # mode A/B) the bf16x3 split LOSES ~1.5x on this one-application-
        # per-program kernel at blocked-route canvas sizes — the split's
        # relayout/VPU overhead isn't amortized — while the mega kernel
        # (many applications per program, hoisted table splits) wins ~2x.
        out = _spectral_poly_block(xf, qhat2, fwd_ref[...], inv_ref[...],
                                   cy_ref[...], sy_ref[...], kp,
                                   compensated=False)
        if clip:
            out = jnp.clip(out, 0.0, 1.0)
        if replicate_pad:
            out_ref[0] = out[half:h - half,
                             half:half + w_raw].astype(out_ref.dtype)
        else:
            out_ref[0] = out.astype(out_ref.dtype)

    return kernel


def _fused_call(x, params, coeffs, replicate_pad=False,
                clip=False, interpret=False, half=12):
    n, h_in, w_in = x.shape
    pad = 2 * half if replicate_pad else 0
    h = h_in + pad
    wc = w_in + pad
    kp = _packed_k(wc)
    fwd, inv = _dft_operands_packed(wc, x.dtype)
    cy, sy = _ydft_operands(h, x.dtype)
    er, ei, cyt, syt = (jnp.asarray(m) for m in _tap_tables_np(h, wc, half))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h_in, w_in), lambda i, *_: (i, 0, 0)),
                  pl.BlockSpec((wc, 2 * kp), lambda i, *_: (0, 0)),
                  pl.BlockSpec((2 * kp, wc), lambda i, *_: (0, 0)),
                  pl.BlockSpec((h, h), lambda i, *_: (0, 0)),
                  pl.BlockSpec((h, h), lambda i, *_: (0, 0)),
                  pl.BlockSpec((128, kp), lambda i, *_: (0, 0)),
                  pl.BlockSpec((128, kp), lambda i, *_: (0, 0)),
                  pl.BlockSpec((h, 32), lambda i, *_: (0, 0)),
                  pl.BlockSpec((h, 32), lambda i, *_: (0, 0))],
        out_specs=pl.BlockSpec((1, h_in, w_in), lambda i, *_: (i, 0, 0)),
    )
    return pl.pallas_call(
        _make_kernel(replicate_pad, clip, half),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, h_in, w_in), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(params.astype(jnp.float32), coeffs.astype(jnp.float32), x,
      fwd, inv, cy, sy, er, ei, cyt, syt)


def _xla_reference(x, params, coeffs, half=12):
    """Equivalent XLA composition (same math; used for the backward pass
    and as the CPU oracle) — delegates to ops.sep_poly's spectral
    composition. Differentiable in x, params, coeffs."""
    from ..sep_poly import _spectral2d

    a = params[:, 0]
    b = params[:, 1]
    c = params[:, 2]
    a3, a2, a1, beta = coeffs[0], coeffs[1], coeffs[2], coeffs[3]
    return _spectral2d(x, a, b, c, (a3, a2, a1, beta), half)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_polynomial_pallas(x, params, coeffs, replicate_pad=False,
                            clip=False, interpret=False, half=12):
    """p(K) on a (padded) tile batch.

    :param x: (N, H, W) tiles (rectangles fine — no orientation transpose)
    :param params: (N, 3) per-tile quadratic-form scalars [a, b, c]
        (ops.sep_poly.gaussian_quadratic_coeffs)
    :param coeffs: (4,) Horner coefficients [a3, a2, a1, beta]
    :param half: static kernel half-support (ker_size // 2, <= 15)
    """
    return _fused_call(x, params, coeffs, replicate_pad=replicate_pad,
                       clip=clip, interpret=interpret, half=half)


def _fwd(x, params, coeffs, replicate_pad, clip, interpret, half):
    out = _fused_call(x, params, coeffs, replicate_pad=replicate_pad,
                      clip=clip, interpret=interpret, half=half)
    return out, (x, params, coeffs)


def _bwd(replicate_pad, clip, interpret, half, res, g):
    x, params, coeffs = res

    def ref_fn(x_, p_, c_):
        if replicate_pad:
            xp = jnp.pad(x_, [(0, 0), (half, half), (half, half)],
                         mode="edge")
            out = _xla_reference(xp, p_, c_, half)
            out = out[:, half:-half, half:-half]
        else:
            out = _xla_reference(x_, p_, c_, half)
        return jnp.clip(out, 0.0, 1.0) if clip else out

    _, vjp = jax.vjp(ref_fn, x, params, coeffs)
    return vjp(g)


fused_polynomial_pallas.defvjp(_fwd, _bwd)
