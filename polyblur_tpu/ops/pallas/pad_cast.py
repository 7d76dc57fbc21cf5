"""Fused edge-pad + dtype-cast: one single-pass Pallas kernel.

The blended mega route's XLA prologue — ``jnp.pad(x.astype(bf16),
mode='edge')`` onto the tile-grid canvas — costs ~0.7 ms at 12MP
(~310 GB/s for its 224 MB of HBM traffic; VERDICT r4 breakdown row C).
XLA lowers the centered pad as a windowed copy whose interior is
lane-shifted by the left pad, and does not reach the HBM roofline. This
kernel streams the image once: each program owns one (H, W) channel
plane, walks it in static row stripes (aligned double-buffered DMA
windows), builds the replicate-padded stripe with STATIC concats (the
pad widths are compile-time constants, so edge replication is a sublane/
lane broadcast — no gathers, no selects), casts, and writes the padded
plane. HBM traffic = read the image once + write the canvas once.

Geometry gates (caller falls back to ``jnp.pad`` otherwise):
``H % 8 == 0``, ``H >= 16``, ``W >= 128`` — always true for the 12MP
serving canvases. Ragged widths are fine: the ragged right columns the
128-aligned DMA cannot reach travel as a tiny lane-padded side array,
and the output stripes are BlockSpec-managed stores.

Reference semantics: torch F.pad(mode='replicate') as used by the patch
engine (deblurring.py:281-298); exactness vs ``jnp.pad(mode='edge')`` is
pinned by tests/test_patches.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["edge_pad_cast", "edge_pad_cast_ok"]

#: Output-stripe height (sublane-aligned); 256 keeps the double-buffered
#: f32 DMA windows ~4 MB at 4K-wide images.
_RS = 256


def edge_pad_cast_ok(h: int, w: int, pads) -> bool:
    """Static geometry gate (see module docstring). Only the DMA READS
    constrain alignment (input rows 8-aligned, main span 128-aligned by
    construction); the output stripe stores are BlockSpec-managed and
    admit ragged canvas extents."""
    pt, pb, pl_, pr_ = pads
    return (h % 8 == 0 and h >= 16
            and min(pt, pb, pl_, pr_) >= 0 and w >= 128)


def _make_kernel(n_stripes, H, W, Wm, tail_w, pads, RS):
    pt, pb, pl_, pr_ = pads
    Hp = H + pt + pb
    Wp = W + pl_ + pr_

    def _win(s):
        """Static DMA window of output stripe s: aligned input rows."""
        r0 = s * RS
        r1 = min(Hp, r0 + RS)
        lo = min(max(r0 - pt, 0), H - 1)
        hi = min(max(r1 - 1 - pt, 0), H - 1)
        a0 = (lo // 8) * 8
        a1 = min(H, -(-(hi + 1) // 8) * 8)
        return r0, r1, a0, a1

    def kernel(x_ref, tail_ref, out_ref, b0, b1, sem):
        n = pl.program_id(0)
        bufs = (b0, b1)

        def _copy(s, slot):
            _, _, a0, a1 = _win(s)
            return pltpu.make_async_copy(
                x_ref.at[n, pl.ds(a0, a1 - a0), pl.ds(0, Wm)],
                bufs[slot].at[pl.ds(0, a1 - a0)], sem.at[slot])

        _copy(0, 0).start()
        for s in range(n_stripes):
            slot = s % 2
            if s + 1 < n_stripes:
                _copy(s + 1, (s + 1) % 2).start()
            _copy(s, slot).wait()
            r0, r1, a0, a1 = _win(s)
            R = r1 - r0
            z = bufs[slot][: a1 - a0, :]
            if tail_w:
                z = jnp.concatenate([z, tail_ref[0, a0:a1, :tail_w]],
                                    axis=1)  # (rows, W)
            # Column (lane) replication FIRST, sourced from the raw
            # buffer rows, then row (sublane) replication of the already
            # column-padded rows. Each broadcast is single-axis — the
            # corner pixels come from materialized concat rows, never a
            # broadcast-of-a-broadcast, which Mosaic folds into an
            # unimplemented scalar->2D (both-axes) vector.broadcast.
            cols = [z]
            if pl_:
                cols.insert(0, jnp.broadcast_to(z[:, :1], (a1 - a0, pl_)))
            if pr_:
                cols.append(
                    jnp.broadcast_to(z[:, W - 1:W], (a1 - a0, pr_)))
            zw = cols[0] if len(cols) == 1 else jnp.concatenate(cols, 1)
            trep = max(0, min(pt - r0, R))
            brep = max(0, min(r1 - (pt + H), R))
            mid = R - trep - brep
            parts = []
            if trep:
                parts.append(jnp.broadcast_to(zw[:1], (trep, W + pl_ + pr_)))
            if mid:
                m0 = (r0 + trep - pt) - a0
                parts.append(zw[m0:m0 + mid])
            if brep:
                parts.append(jnp.broadcast_to(
                    zw[H - 1 - a0:H - a0], (brep, W + pl_ + pr_)))
            st = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
            out_ref[0, r0:r1, :] = st.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def edge_pad_cast(x: jnp.ndarray, pads, out_dtype=None,
                  interpret: bool = False) -> jnp.ndarray:
    """``jnp.pad(x, pads, mode='edge').astype(out_dtype)`` in one pass.

    Differentiable: the custom VJP is the exact transpose of the
    replicate-pad + cast (taken from the XLA reference form), so the
    blended mega route's gradient path is unchanged by the kernel.

    :param x: (B, C, H, W) image batch (any float dtype)
    :param pads: static (top, bottom, left, right), all >= 0
    :param out_dtype: output dtype (default: input dtype) — the cast
        rides the pad's single HBM pass (replicated pixels are cast the
        same way XLA orders cast-then-pad, so results are bit-identical)
    """
    return _edge_pad_cast_impl(x, pads, out_dtype, interpret)


def _edge_pad_cast_fwd(x, pads, out_dtype, interpret):
    # residuals must be JAX types: carry x's dtype on a zero-size array
    # (its shape is recoverable from the cotangent's shape minus the pads)
    return _edge_pad_cast_impl(x, pads, out_dtype, interpret), \
        jnp.zeros((0,), x.dtype)


def _edge_pad_cast_bwd(pads, out_dtype, interpret, res, g):
    dt = res.dtype
    pt, pb, pl_, pr_ = pads
    b, c, Hp, Wp = g.shape
    shape = (b, c, Hp - pt - pb, Wp - pl_ - pr_)
    odt = jnp.dtype(out_dtype) if out_dtype is not None else dt

    def ref(v):  # the XLA form the kernel is bit-equal to
        return jnp.pad(v.astype(odt),
                       ((0, 0), (0, 0), (pt, pb), (pl_, pr_)), mode="edge")

    _, vjp = jax.vjp(ref, jnp.zeros(shape, dt))  # linear: primal irrelevant
    return (vjp(g)[0],)


edge_pad_cast.defvjp(_edge_pad_cast_fwd, _edge_pad_cast_bwd)


@functools.partial(jax.jit,
                   static_argnames=("pads", "out_dtype", "interpret"))
def _edge_pad_cast_impl(x: jnp.ndarray, pads, out_dtype=None,
                        interpret: bool = False) -> jnp.ndarray:
    b, c, H, W = x.shape
    pt, pb, pl_, pr_ = pads
    if not edge_pad_cast_ok(H, W, pads):
        raise ValueError(f"edge_pad_cast geometry gate failed for "
                         f"{(H, W)} pads {pads} — use jnp.pad")
    Hp, Wp = H + pt + pb, W + pl_ + pr_
    odt = jnp.dtype(out_dtype) if out_dtype is not None else x.dtype
    xf = x.reshape(b * c, H, W)
    Wm = (W // 128) * 128
    tail_w = W - Wm
    # the ragged right columns [Wm, W) are unreachable by (128-aligned)
    # DMA — hand them to the kernel as a tiny lane-padded side array
    if tail_w:
        tail = jnp.pad(xf[:, :, Wm:], ((0, 0), (0, 0), (0, 128 - tail_w)))
    else:
        tail = jnp.zeros((b * c, H, 128), x.dtype)
    RS = _RS
    n_stripes = -(-Hp // RS)
    rb = RS + 16  # covers the align-down and the stripe slack
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b * c,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, H, 128), lambda n: (n, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hp, Wp), lambda n: (n, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((rb, Wm), x.dtype),
            pltpu.VMEM((rb, Wm), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(n_stripes, H, W, Wm, tail_w,
                     (pt, pb, pl_, pr_), RS),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * c, Hp, Wp), odt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xf, tail)
    return out.reshape(b, c, Hp, Wp)
