"""Pallas TPU kernels for the circular row shear and the exact Gaussian
fold (ops/shear.py).

Per-row circular lane shift by d_y = s * (y - yc). The per-row variable
shift is decomposed into log2(W) *static* circular rolls gated by per-row
bit masks — fully vectorized VPU work on a VMEM-resident block, no scalar
loops and no gathers:

    q_y = floor(d_y) mod Wc                   # in [0, Wc)
    z   = x
    for bit b: z = where(bit_b(q_y), roll(z, -2^b), z)
    out = interp tail over static rolls       # fractional part

The fractional tail is a Lanczos-3 blend (6 static rolls). (The exact
conv+shear fold is spectral — see sep_poly_fused._spec_phase /
_tap_spectrum_k, which build it from in-VMEM DFT matmuls — so it has
no roll kernel here.)

This is the TPU-native replacement for the per-pixel bilinear sampling
loop of the reference's oriented-convolution C++ kernel
(separable_gaussian2d.cpp:127-156).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..shear import lanczos3_weights

__all__ = ["shear_rows_pallas"]


def _lroll(v, k, wc):
    """Circular left-roll by static k: out[x] = v[(x + k) mod wc].

    Static slice + concat lowers to plain vector moves — measured ~1.5x
    faster than pltpu.roll AND ~100x faster to Mosaic-compile (the
    rotate primitive lowers to dynamic-rotate machinery even for
    static shifts).
    """
    k = k % wc
    if k == 0:
        return v
    return jnp.concatenate([v[:, k:], v[:, :k]], axis=1)


def _shear_kernel(s_ref, x_ref, out_ref, *, frac: bool, n_bits: int):
    _, h, wc = x_ref.shape
    s = s_ref[pl.program_id(0)]
    yc = (h - 1) / 2.0
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0).astype(jnp.float32)
    d = s * (rows - yc)                      # (H,1) signed shift
    k = jnp.floor(d)
    a = d - k                                # (H,1) f32 fraction in [0,1)
    q = jnp.mod(k.astype(jnp.int32), wc)     # (H,1) in [0, Wc)

    # Mosaic's f32 vector path; bf16 inputs are upcast on load.
    z = x_ref[0].astype(jnp.float32)
    for b in range(n_bits):
        step = 1 << b
        if step >= wc:
            break
        bit = jnp.equal(jnp.bitwise_and(q, step), step)  # (H,1) bool
        z = jnp.where(bit, _lroll(z, step, wc), z)
    if frac:
        # Lanczos-3 tail, sequential accumulation (the sequential form
        # compiles ~300x faster in Mosaic than sum-of-products).
        ws = lanczos3_weights(a)
        acc = ws[2] * z
        for wj, off in zip(ws, range(-2, 4)):
            if off == 0:
                continue
            acc = acc + wj * _lroll(z, off, wc)
        z = acc
    out_ref[0] = z.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("frac", "interpret"))
def shear_rows_pallas(x: jnp.ndarray, s: jnp.ndarray,
                      frac: bool = True,
                      interpret: bool = False) -> jnp.ndarray:
    """(N, H, Wc) circular Lanczos-3 row shear, one grid program per image.

    Semantics match ops.shear._shear_rows_jnp exactly:
    out[n, y, v] = x[n, y, (v + d_y) mod Wc].
    """
    n, h, wc = x.shape
    n_bits = max(1, (wc - 1).bit_length())
    kernel = functools.partial(_shear_kernel, frac=frac, n_bits=n_bits)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h, wc), lambda i, s: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, h, wc), lambda i, s: (i, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, wc), x.dtype),
        interpret=interpret,
    )(s.astype(jnp.float32), x)
