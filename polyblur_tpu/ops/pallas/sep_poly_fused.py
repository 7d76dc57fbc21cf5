"""Fused Pallas kernel: the ENTIRE degree-3 polynomial deconvolution of one
tile — band-matrix construction, canvas embed, shear, six MXU matmuls,
Horner combines, unshear, crop — in a single VMEM-resident program.

Design history (each stage measured on v5e through the axon tunnel):

* unfused XLA composition: ~14 ms / application — dominated NOT by the
  matmuls but by materializing the (N, Wc, Wc)/(N, H, H) banded Toeplitz
  operators in HBM (both gather- and reshape-based constructions cost
  4-9 ms) plus canvas embed/crop passes;
* fused kernel with operators passed in: ~6.5 ms;
* this version: the operators never exist in HBM at all — each program
  rebuilds its two band matrices analytically in VMEM,
  ``exp(-0.5 coef (u - v)^2) * inv_norm`` masked to the 25-tap band, from
  five per-tile scalars. Matrix "construction" is ~0.4M VPU exps per
  program, overlapped with the MXU dots.

Gradients: parameter gradients flow through the per-tile scalars
(s, a, c', norms), so the custom VJP differentiates the equivalent XLA
composition; the Pallas kernel only runs forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..shear import keys_weights

__all__ = ["fused_polynomial_pallas"]

_HALF = 12


def _row_shift(z, s, h, wc):
    """Circular per-row column shift of z (H, Wc) f32 by s*(y - yc):
    log2 static-roll decomposition + sequential Keys-cubic tail.
    Must match ops.shear._shear_rows_jnp exactly."""
    yc = (h - 1) / 2.0
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0).astype(jnp.float32)
    d = s * (rows - yc)
    k = jnp.floor(d)
    a = d - k
    q = jnp.mod(k.astype(jnp.int32), wc)

    def lroll(v, kk):
        kk = kk % wc
        if kk == 0:
            return v
        return jnp.concatenate([v[:, kk:], v[:, :kk]], axis=1)

    for b in range(max(1, (wc - 1).bit_length())):
        step = 1 << b
        if step >= wc:
            break
        bit = jnp.equal(jnp.bitwise_and(q, step), step)
        z = jnp.where(bit, lroll(z, step), z)
    wm1, w0, w1, w2 = keys_weights(a)
    acc = w0 * z
    acc = acc + wm1 * lroll(z, -1)
    acc = acc + w1 * lroll(z, 1)
    acc = acc + w2 * lroll(z, 2)
    return acc


def _band_operator(coef, inv_norm, n, dtype):
    """(n, n) 'same' Gaussian band operator, built analytically in VMEM:
    B[u, v] = exp(-0.5 coef (u-v)^2) * inv_norm for |u - v| <= HALF."""
    du = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    dv = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    d = (du - dv).astype(jnp.float32)
    band = jnp.exp((-0.5 * coef) * d * d) * inv_norm
    return jnp.where(jnp.abs(d) <= float(_HALF), band, 0.0).astype(dtype)


def _make_kernel(margin: int, replicate_pad: bool, clip: bool):
    def kernel(p_ref, co_ref, x_ref, out_ref):
        _, h_in, w_raw = x_ref.shape
        i = pl.program_id(0)
        s = p_ref[i, 0]
        coef_x = p_ref[i, 1]
        coef_v = p_ref[i, 2]
        inx = p_ref[i, 3]
        inv = p_ref[i, 4]
        a3 = co_ref[0]
        a2 = co_ref[1]
        a1 = co_ref[2]
        beta = co_ref[3]

        xin = x_ref[0]  # (H, W) tile
        dt = xin.dtype
        if replicate_pad:
            # replicate-pad rows and columns by the kernel half-support in
            # VMEM (pad_with_kernel semantics, utils.py:48-53)
            top = jnp.broadcast_to(xin[:1], (_HALF, w_raw))
            bot = jnp.broadcast_to(xin[-1:], (_HALF, w_raw))
            xin = jnp.concatenate([top, xin, bot], axis=0)
            left = jnp.broadcast_to(xin[:, :1], (xin.shape[0], _HALF))
            right = jnp.broadcast_to(xin[:, -1:], (xin.shape[0], _HALF))
            xin = jnp.concatenate([left, xin, right], axis=1)
        h = h_in + 2 * _HALF if replicate_pad else h_in
        w_in = w_raw + 2 * _HALF if replicate_pad else w_raw
        wc = w_in + 2 * margin
        zmargin = jnp.zeros((h, margin), dt)
        x = jnp.concatenate([zmargin, xin, zmargin], axis=1)  # (H, Wc)

        xm = _band_operator(coef_x, inx, wc, dt)
        vm = _band_operator(coef_v, inv, h, dt)

        def xconv(u):  # sum_v u[h, v] xm[v, u']   (xm symmetric)
            return jax.lax.dot(u.astype(dt), xm,
                               preferred_element_type=jnp.float32)

        def vconv(u):  # sum_z vm[y, z] u[z, w]
            return jax.lax.dot(vm, u.astype(dt),
                               preferred_element_type=jnp.float32)

        t = xconv(x)                      # X u            (f32)
        w = _row_shift(t, s, h, wc)       # Sh(X u)
        r = a3 * w
        r = a2 * w + xconv(vconv(r))
        r = a1 * w + xconv(vconv(r))
        out = beta * x.astype(jnp.float32) + _row_shift(vconv(r), -s, h, wc)
        if clip:
            out = jnp.clip(out, 0.0, 1.0)
        if replicate_pad:
            out_ref[0] = out[_HALF:h - _HALF,
                             margin + _HALF:margin + w_in - _HALF].astype(
                                 out_ref.dtype)
        else:
            out_ref[0] = out[:, margin:margin + w_in].astype(out_ref.dtype)

    return kernel


def _fused_call(x, params, coeffs, margin, replicate_pad=False,
                clip=False, interpret=False):
    n, h, w_in = x.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h, w_in), lambda i, *_: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, h, w_in), lambda i, *_: (i, 0, 0)),
    )
    return pl.pallas_call(
        _make_kernel(margin, replicate_pad, clip),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, w_in), x.dtype),
        interpret=interpret,
    )(params.astype(jnp.float32), coeffs.astype(jnp.float32), x)


def _xla_reference(x, params, coeffs, margin):
    """Equivalent XLA composition (same math; used for the backward pass
    and as the CPU oracle). Differentiable in x, params, coeffs."""
    from ..shear import shear_rows

    n, h, w_in = x.shape
    wc = w_in + 2 * margin
    s = params[:, 0]
    coef_x = params[:, 1]
    coef_v = params[:, 2]
    inx = params[:, 3]
    inv = params[:, 4]
    a3, a2, a1, beta = coeffs[0], coeffs[1], coeffs[2], coeffs[3]
    dt = x.dtype

    def band(coef, norm, m):
        u = jnp.arange(m, dtype=jnp.float32)[:, None]
        v = jnp.arange(m, dtype=jnp.float32)[None, :]
        d = u - v
        B = jnp.exp(-0.5 * coef[:, None, None] * (d * d)[None]) \
            * norm[:, None, None]
        return jnp.where(jnp.abs(d)[None] <= float(_HALF), B, 0.0).astype(dt)

    xmat = band(coef_x, inx, wc)
    vmat = band(coef_v, inv, h)
    xc = jnp.zeros((n, h, wc), dt).at[:, :, margin:margin + w_in].set(x)

    def xconv(u):
        return jnp.einsum("nhv,nvu->nhu", u, xmat,
                          preferred_element_type=jnp.float32).astype(dt)

    def vconv(u):
        return jnp.einsum("nyz,nzw->nyw", vmat, u,
                          preferred_element_type=jnp.float32).astype(dt)

    w = shear_rows(xconv(xc), s)
    r = a3 * w
    r = a2 * w + xconv(vconv(r))
    r = a1 * w + xconv(vconv(r))
    out = (beta * xc + shear_rows(vconv(r), -s)).astype(dt)
    return out[:, :, margin:margin + w_in]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_polynomial_pallas(x, params, coeffs, margin, replicate_pad=False,
                            clip=False, interpret=False):
    """p(K) on a padded tile batch.

    :param x: (N, H, W) replicate-padded tiles
    :param params: (N, 5) per-tile scalars
        [shear slope s, x-quadratic coef a, sheared-y coef c', 1/sum of
        x-taps, 1/sum of y-taps]
    :param coeffs: (4,) Horner coefficients [a3, a2, a1, beta]
    :param margin: static canvas margin (= ceil(HALF * smax), lanes)
    """
    return _fused_call(x, params, coeffs, margin,
                       replicate_pad=replicate_pad, clip=clip,
                       interpret=interpret)


def _fwd(x, params, coeffs, margin, replicate_pad, clip, interpret):
    out = _fused_call(x, params, coeffs, margin,
                      replicate_pad=replicate_pad, clip=clip,
                      interpret=interpret)
    return out, (x, params, coeffs)


def _bwd(margin, replicate_pad, clip, interpret, res, g):
    x, params, coeffs = res

    def ref_fn(x_, p_, c_):
        if replicate_pad:
            xp = jnp.pad(x_, [(0, 0), (_HALF, _HALF), (_HALF, _HALF)],
                         mode="edge")
            out = _xla_reference(xp, p_, c_, margin)
            out = out[:, _HALF:-_HALF, _HALF:-_HALF]
        else:
            out = _xla_reference(x_, p_, c_, margin)
        return jnp.clip(out, 0.0, 1.0) if clip else out

    _, vjp = jax.vjp(ref_fn, x, params, coeffs)
    return vjp(g)


fused_polynomial_pallas.defvjp(_fwd, _bwd)
