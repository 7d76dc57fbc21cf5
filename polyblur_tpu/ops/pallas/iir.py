"""Pallas TPU kernel: bidirectional first-order IIR scan along rows.

The Gastal-Oliveira recursive filter's recurrence (domain_transform.py:66-85
in the reference; "cannot be parallelized" per its C++ port, RF.cpp:7-11) is
an affine-map prefix composition:

    y[i] = (1 - v[i]) x[i] + v[i] y[i-1]   <=>   y = (A_i o ... o A_0)(0),
    A_i = (t -> v[i] t + (1 - v[i]) x[i])

Affine maps compose associatively, so the scan runs in log2(W) Hillis-Steele
doubling steps over the lane axis, entirely on the VPU with *static* lane
shifts (concat-slices; no dynamic-rotate machinery). The backward pass
reuses the same scan on the reversed axis.

This is the TPU-native replacement for the reference's sequential C++ RF
kernel (RF.cpp:14-39); the XLA ``associative_scan`` variant in
ops/domain_transform.py is the cross-check oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["iir_scan_rows_pallas"]


def _shift_right_fill(v, k, fill):
    """out[x] = v[x - k] for x >= k, else fill (identity-map padding)."""
    if k == 0:
        return v
    pad = jnp.full_like(v[:, :k], fill)
    return jnp.concatenate([pad, v[:, :-k]], axis=1)


def _shift_left_fill(v, k, fill):
    """out[x] = v[x + k] for x < w - k, else fill (identity-map padding)."""
    if k == 0:
        return v
    pad = jnp.full_like(v[:, :k], fill)
    return jnp.concatenate([v[:, k:], pad], axis=1)


def _prefix_affine(a, b, w):
    """Inclusive prefix composition of affine maps (a, b) along lanes:
    returns (A, B) with y[i] = (A_i, B_i) applied to y[-1]=0, i.e. y = B."""
    step = 1
    while step < w:
        a_prev = _shift_right_fill(a, step, 1.0)
        b_prev = _shift_right_fill(b, step, 0.0)
        # compose: (a, b) o (a_prev, b_prev) = (a*a_prev, a*b_prev + b)
        b = a * b_prev + b
        a = a * a_prev
        step *= 2
    return a, b


def _suffix_affine(a, b, w):
    """Inclusive suffix composition: returns (A, B) with
    z[i] = a[i] z[i+1] + b[i] solved as z = B (z[w] = 0). The mirror of
    :func:`_prefix_affine` — left shifts instead of right shifts, so no
    lane reversal is needed (``lax.rev`` has no Mosaic lowering)."""
    step = 1
    while step < w:
        a_next = _shift_left_fill(a, step, 1.0)
        b_next = _shift_left_fill(b, step, 0.0)
        b = a * b_next + b
        a = a * a_next
        step *= 2
    return a, b


def _iir_kernel(x_ref, v_ref, out_ref):
    _, h, w = x_ref.shape
    x = x_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    # forward: v[0] forced to 0 (domain_transform.py:73 starts at i=1)
    col0 = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) == 0
    vf = jnp.where(col0, 0.0, v)
    _, y = _prefix_affine(vf, (1.0 - vf) * x, w)

    # backward: coefficients shifted one left, suffix scan (no reversal)
    colL = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) == (w - 1)
    vs = jnp.where(colL, 0.0, _shift_left_fill(v, 1, 0.0))
    _, z = _suffix_affine(vs, (1.0 - vs) * y, w)
    out_ref[0] = z.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def iir_scan_rows_pallas(x: jnp.ndarray, v: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """Bidirectional IIR along the last axis; semantics identical to
    ops.domain_transform.iir_scan_rows.

    Differentiable: the backward pass replays the XLA associative-scan
    formulation's VJP (Pallas kernels have no automatic transpose), so
    gradients flow through the DT smoother on TPU — including the mega
    kernel's custom backward, which routes through recursive_filter.

    :param x: (..., H, W) signal
    :param v: same shape, feedback coefficients in [0, 1)
    """
    return _iir_pallas(x, v, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _iir_pallas(x, v, interpret=False):
    return _iir_pallas_call(x, v, interpret)


def _iir_fwd(x, v, interpret):
    return _iir_pallas_call(x, v, interpret), (x, v)


def _iir_bwd(interpret, res, g):
    from ..domain_transform import iir_scan_rows

    x, v = res
    _, vjp = jax.vjp(iir_scan_rows, x, v)
    return vjp(g)


_iir_pallas.defvjp(_iir_fwd, _iir_bwd)


def _iir_pallas_call(x: jnp.ndarray, v: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    shape = x.shape
    h, w = shape[-2:]
    n = 1
    for d in shape[:-2]:
        n *= d
    x3 = x.reshape(n, h, w)
    v3 = jnp.broadcast_to(v, shape).reshape(n, h, w)
    # Rows are independent, so block over H to keep each program's VMEM
    # footprint bounded regardless of image size (whole 2MP+ slabs blew the
    # 16MB scoped-vmem stack limit). ~1MB per buffer (x/v/out + ~6 live
    # doubling-step temporaries ~= 9MB scoped), f32-sublane aligned.
    bh = max(8, min(h, (1 * 2**20) // (w * 4)) // 8 * 8)
    grid_h = -(-h // bh)
    out = pl.pallas_call(
        _iir_kernel,
        grid=(n, grid_h),
        in_specs=[pl.BlockSpec((1, bh, w), lambda i, j: (i, j, 0)),
                  pl.BlockSpec((1, bh, w), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((1, bh, w), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w), x.dtype),
        interpret=interpret,
    )(x3, v3)
    return out.reshape(shape)
