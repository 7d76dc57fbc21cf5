"""The whole-pipeline mega-kernel: N complete Polyblur iterations for one
tile — blur estimation (gradient matmuls, directional maxima, Keys angle
interpolation, argmin, affine model) AND the shear-factorized polynomial
deconvolution of every channel — in a single VMEM-resident Pallas program.

Each tile is read from HBM once and written once for the entire blind
deblurring; every intermediate of every iteration lives in VMEM. This is
the terminal point of the fusion ladder (see ops/pallas/sep_poly_fused.py
for the per-application kernel and its design history).

Applicability: the default hot configuration only — q == 0, no saturation
mask, shared (non-multichannel) kernel, no halo/edgetaper/prefilter,
ker_size 25, n_interpolated_angles == 30 (which makes the interpolated
angle grid exactly 6-degree-integer, so the reference's integer-truncated
grids are exact). Everything else falls back to the composed path.

Scalar estimation stages are computed with (1, 128)-lane vector tricks:
the 30 interpolated magnitudes live in lanes 0..29 of one vector, argmin
is min+compare+lane-iota reduction (first-minimum tie-break like
torch.argmin), the orthogonal magnitude is a masked lane reduction.

Forward-only; the custom VJP differentiates the composed XLA pipeline.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sep_poly_fused import _row_shift, _band_operator
from ..spectral_matmul import _derivative_matrix_np

__all__ = ["polyblur_tiles_fused"]

_HALF = 12
_NA = 6          # n_angles
_NI = 30         # n_interpolated_angles


@functools.lru_cache(maxsize=4)
def _interp_weights_np():
    """(30, 7) Keys-cubic interpolation weights of the reference's angle
    grids (blur_estimation.py:138-148 with the integer-truncated thetas of
    deblurring.py:62-63), incl. the 1e-5 weight-sum guard."""
    x = np.floor(np.linspace(0, 180, _NA + 1)) / _NI
    xn = np.floor(np.arange(0, 180, 180 / _NI)) / _NI
    d = np.abs(xn[:, None] - x[None, :])
    w = np.where(d < 1, (1.5 * d - 2.5) * d * d + 1,
                 np.where(d < 2, ((-0.5 * d + 2.5) * d - 4) * d + 2, 0.0))
    w = w / (w.sum(axis=1, keepdims=True) + 1e-5)
    return w.astype(np.float32)


def _make_kernel(n_iter: int, margin: int, csz: int):
    angles = [k * math.pi / _NA for k in range(_NA + 1)]

    def kernel(co_ref, x_ref, dw_ref, dh_ref, wr_ref, out_ref, ts_ref):
        _, c, ht, wt = x_ref.shape
        a3 = co_ref[0]
        a2 = co_ref[1]
        a1 = co_ref[2]
        beta = co_ref[3]
        cc = co_ref[4] * co_ref[4]   # c^2 of the affine model
        bb = co_ref[5] * co_ref[5]   # b^2
        smax = co_ref[6]

        dw = dw_ref[...]   # (Wt, Wt) f32
        dh = dh_ref[...]   # (Ht, Ht) f32

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        lane_f = lane.astype(jnp.float32)
        big = jnp.float32(1e30)

        h = ht + 2 * _HALF
        w_in = wt + 2 * _HALF
        wc = w_in + 2 * margin

        def iteration(_, carry):
            # ---------------- estimation (shared across channels) -------
            gray = ts_ref[0].astype(jnp.float32)
            for ch in range(1, csz):
                gray = gray + ts_ref[ch].astype(jnp.float32)
            gray = gray * (1.0 / csz)
            vmin = jnp.min(gray)
            vmax = jnp.max(gray)
            g = jnp.clip((gray - vmin) / jnp.maximum(vmax - vmin, 1e-8),
                         0.0, 1.0)
            gx = jax.lax.dot_general(g, dw, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            gy = jax.lax.dot(dh, g, preferred_element_type=jnp.float32)

            wr = wr_ref[...]  # (8, 128): row j = interp weights of angle j
            vals = jnp.zeros((1, 128), jnp.float32)
            for j, t in enumerate(angles):
                m_j = jnp.max(jnp.abs(math.cos(t) * gx - math.sin(t) * gy))
                vals = vals + m_j * wr[j:j + 1, :]
            vals = jnp.where(lane < _NI, vals, big)

            mn = jnp.min(vals)
            idx = jnp.min(jnp.where(vals <= mn, lane, 1000))
            io = jnp.mod(idx + _NI // 2, _NI)
            mo = jnp.min(jnp.where(lane == io, vals, big))

            sigma2 = jnp.clip(cc / (mn * mn + 1e-8) - bb, 0.09, 16.0)
            rho2 = jnp.clip(cc / (mo * mo + 1e-8) - bb, 0.09, 16.0)
            theta = idx.astype(jnp.float32) * (6.0 * math.pi / 180.0)

            ct = jnp.cos(-theta)
            st = jnp.sin(-theta)
            inv_l1 = 1.0 / sigma2
            inv_l2 = 1.0 / rho2
            qa = ct * ct * inv_l1 + st * st * inv_l2
            qb = st * ct * (inv_l1 - inv_l2)
            qc = ct * ct * inv_l2 + st * st * inv_l1
            s = jnp.clip(-qb / qa, -smax, smax)
            cp = jnp.maximum(qc - qb * qb / qa, 1e-4)

            # tap normalizers: 1 / sum_t exp(-0.5 coef t^2), t in [-12, 12]
            tl = lane_f - _HALF
            tmask = lane < (2 * _HALF + 1)
            inx = 1.0 / jnp.sum(
                jnp.where(tmask, jnp.exp(-0.5 * qa * tl * tl), 0.0))
            inv = 1.0 / jnp.sum(
                jnp.where(tmask, jnp.exp(-0.5 * cp * tl * tl), 0.0))

            # ---------------- deconvolution per channel -----------------
            # bf16 Horner intermediates (same numerics as the composed XLA
            # path, which casts after every einsum) keep VMEM pressure and
            # MXU inputs at bf16; channel results stream through the
            # scratch ref so only one channel chain is live at a time.
            dt = ts_ref.dtype
            xm = _band_operator(qa, inx, wc, dt)
            vm = _band_operator(cp, inv, h, dt)

            def xconv(u):
                return jax.lax.dot(
                    u.astype(dt), xm,
                    preferred_element_type=jnp.float32).astype(dt)

            def vconv(u):
                return jax.lax.dot(
                    vm, u.astype(dt),
                    preferred_element_type=jnp.float32).astype(dt)

            for ch in range(csz):
                xin = ts_ref[ch]
                top = jnp.broadcast_to(xin[:1], (_HALF, wt))
                bot = jnp.broadcast_to(xin[-1:], (_HALF, wt))
                xp = jnp.concatenate([top, xin, bot], axis=0)
                left = jnp.broadcast_to(xp[:, :1], (h, _HALF))
                right = jnp.broadcast_to(xp[:, -1:], (h, _HALF))
                xp = jnp.concatenate([left, xp, right], axis=1)
                zm = jnp.zeros((h, margin), dt)
                xc = jnp.concatenate([zm, xp, zm], axis=1)  # (H, Wc)

                wsh = _row_shift(xconv(xc).astype(jnp.float32),
                                 s, h, wc).astype(dt)
                r = (a3 * wsh.astype(jnp.float32)).astype(dt)
                r = (a2 * wsh.astype(jnp.float32)
                     + xconv(vconv(r)).astype(jnp.float32)).astype(dt)
                r = (a1 * wsh.astype(jnp.float32)
                     + xconv(vconv(r)).astype(jnp.float32)).astype(dt)
                o = beta * xc.astype(jnp.float32) \
                    + _row_shift(vconv(r).astype(jnp.float32), -s, h, wc)
                o = jnp.clip(o, 0.0, 1.0)
                ts_ref[ch] = o[_HALF:h - _HALF,
                               margin + _HALF:margin + _HALF + wt].astype(dt)
            return carry

        ts_ref[...] = x_ref[0]
        jax.lax.fori_loop(0, n_iter, iteration, 0)
        out_ref[0] = ts_ref[...]

    return kernel


def _fused_call(x, coeffs, n_iter, margin, interpret=False):
    t, c, ht, wt = x.shape
    dw = jnp.asarray(_derivative_matrix_np(wt))
    dh = jnp.asarray(_derivative_matrix_np(ht))
    w_rows = np.zeros((8, 128), np.float32)
    w_rows[:_NA + 1, :_NI] = _interp_weights_np().T
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, c, ht, wt), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((wt, wt), lambda i, *_: (0, 0)),
            pl.BlockSpec((ht, ht), lambda i, *_: (0, 0)),
            pl.BlockSpec((8, 128), lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c, ht, wt), lambda i, *_: (i, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((c, ht, wt), x.dtype)],
    )
    return pl.pallas_call(
        _make_kernel(n_iter, margin, c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(coeffs.astype(jnp.float32), x, dw, dh, jnp.asarray(w_rows))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def polyblur_tiles_fused(x, coeffs, n_iter, margin, interpret=False):
    """N blind Polyblur iterations on a tile batch, fully in-kernel.

    :param x: (T, C, Ht, Wt) tiles in [0, 1]
    :param coeffs: (7,) [a3, a2, a1, beta, c, b, smax]
    :param n_iter: static iteration count
    :param margin: static shear-canvas margin (ceil(HALF * smax))
    """
    return _fused_call(x, coeffs, n_iter, margin, interpret=interpret)


def _ref_pipeline(x, coeffs, n_iter):
    """Composed XLA pipeline with identical math — backward-pass and
    cross-check oracle (polyblur_core with the mega kernel disabled)."""
    from ...pipeline import polyblur_core

    a3, a2, a1, beta = coeffs[0], coeffs[1], coeffs[2], coeffs[3]
    # invert the Horner coefficients back to (alpha, beta):
    # a3 = alpha/2 - beta + 2  =>  alpha = 2*(a3 + beta - 2)
    alpha = 2.0 * (a3 + beta - 2.0)
    return polyblur_core(x, n_iter=n_iter, c=coeffs[4], b=coeffs[5],
                         alpha=alpha, beta=beta, method="direct_separable",
                         _disable_mega=True)


def _fwd(x, coeffs, n_iter, margin, interpret):
    return _fused_call(x, coeffs, n_iter, margin, interpret=interpret), (
        x, coeffs)


def _bwd(n_iter, margin, interpret, res, g):
    x, coeffs = res
    _, vjp = jax.vjp(lambda x_, c_: _ref_pipeline(x_, c_, n_iter), x, coeffs)
    return vjp(g)


polyblur_tiles_fused.defvjp(_fwd, _bwd)
