"""Fused windowed overlap-add: tile batch -> blended canvas in one kernel.

TPU-native replacement for the XLA reshape-decomposition join in
``patches.overlap_add`` (reference semantics: deblurring.py:333-338 —
``out[tile] += patch * window`` then divide by the window sum). The XLA
join costs ~2.4 ms at 12MP (several full-canvas copy passes for the
moveaxis/pad/add decomposition); this kernel is a single gather-formulated
pass: one program per OUTPUT block computes the blend of the (at most
four) tiles overlapping it, so there is no scatter, no accumulation race,
and every grid dimension is parallel.

Per program (b, bi, bj) over output blocks of the grid step (sh, sw): the
block rows [bi*sh, bi*sh+sh) are covered by tile row ki=bi (its leading sh
rows) and, on the first ``oh = ph - sh`` rows, by tile row ki=bi-1 (its
trailing oh rows) — likewise for columns. Each contributing region is
DMA'd from the (T*B, C, ph, >=pw) batch in HBM ((8, 128)-aligned spans;
see ``_make_kernel`` for how the column overlap is handled when it is not
a lane multiple), multiplied by the matching static window slice,
accumulated in f32, normalized by the precomputed reciprocal window-sum
block, clipped, and written. HBM traffic = read tiles about once + write
the canvas once.

Requires a regular grid with ``step <= patch`` per axis (always true for
plan_patch_grid output), 8-aligned row geometry (sh, ph), a 128-aligned
column step sw, and a tile batch wide enough for the trailing-column DMA
span; ``patches`` gates on that and falls back to the XLA join otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["overlap_add_fused"]


def _lane_span(n: int) -> int:
    return -(-n // 128) * 128


def _make_kernel(bsz: int, th: int, tw: int, sh: int, sw: int,
                 ph: int, pw: int, csz: int):
    oh, ow = ph - sh, pw - sw
    # Mosaic DMA slices must be (8, 128)-aligned in offset AND size on the
    # (sublane, lane) axes. The trailing-column contributions need tile
    # cols [sw, pw) of size ow (typically 64): DMA the 128-aligned
    # enclosing span instead. The caller guarantees the tile batch is wide
    # enough for that span (either ow is already a lane multiple, or the
    # producer emitted lane-padded tiles — zero extra physical traffic,
    # every HBM buffer is lane-padded to 128 anyway); the gather below
    # only uses the leading [:ow] columns of the span.
    ow_span = _lane_span(ow)

    def kernel(tiles_ref, win_ref, inv_ref, out_ref, acc_ref, s1, s2, s3,
               s4, sem):
        b = pl.program_id(0)
        bi = pl.program_id(1)
        bj = pl.program_id(2)
        win = win_ref[...]  # (ph, pw) f32

        acc_ref[...] = jnp.zeros((csz, sh, sw), jnp.float32)

        def tile_idx(ki, kj):
            return (ki * tw + kj) * bsz + b

        def copy(ki, kj, r0, rlen, c0, clen, dst):
            cp = pltpu.make_async_copy(
                tiles_ref.at[tile_idx(ki, kj), :, pl.ds(r0, rlen),
                             pl.ds(c0, clen)], dst, sem)
            cp.start()
            cp.wait()

        @pl.when(jnp.logical_and(bi < th, bj < tw))
        def _():  # tile (bi, bj): leading (sh, sw) corner
            copy(bi, bj, 0, sh, 0, sw, s1)
            acc_ref[...] += s1[...].astype(jnp.float32) * win[:sh, :sw]

        if oh > 0:
            @pl.when(jnp.logical_and(bi >= 1, bj < tw))
            def _():  # tile (bi-1, bj): trailing oh rows
                copy(bi - 1, bj, sh, oh, 0, sw, s2)
                acc_ref[:, :oh, :] += (s2[...].astype(jnp.float32)
                                       * win[sh:, :sw])

        if ow > 0:
            @pl.when(jnp.logical_and(bi < th, bj >= 1))
            def _():  # tile (bi, bj-1): trailing ow columns
                copy(bi, bj - 1, 0, sh, sw, ow_span, s3)
                acc_ref[:, :, :ow] += (s3[:, :, :ow].astype(jnp.float32)
                                       * win[:sh, sw:])

        if oh > 0 and ow > 0:
            @pl.when(jnp.logical_and(bi >= 1, bj >= 1))
            def _():  # tile (bi-1, bj-1): trailing (oh, ow) corner
                copy(bi - 1, bj - 1, sh, oh, sw, ow_span, s4)
                acc_ref[:, :oh, :ow] += (s4[:, :, :ow].astype(jnp.float32)
                                         * win[sh:, sw:])

        out = acc_ref[...] * inv_ref[...][None]
        out_ref[0] = jnp.clip(out, 0.0, 1.0).astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("grid_info", "batch",
                                             "interpret", "out_dtype"))
def overlap_add_fused(tiles: jnp.ndarray, window: jnp.ndarray,
                      inv_wsum: jnp.ndarray, grid_info, batch: int,
                      interpret: bool = False,
                      out_dtype=None) -> jnp.ndarray:
    """Blend a (T*B, C, ph, >=pw) tile batch into a (B, C, Hp, Wp) canvas.

    :param tiles: restored tiles in extract_patches layout (T outer,
        B inner), any float dtype. The lane (last) axis may be WIDER than
        the logical tile width pw (a lane-padded producer, e.g.
        ``polyblur_image_fused(pad_lanes=True)``) — required whenever the
        column overlap ``pw - sw`` is not a multiple of 128, so the
        trailing-column DMA span stays in (logical) bounds.
    :param window: (ph, pw) f32 blending window
    :param inv_wsum: (Hp, Wp) f32 reciprocal window-sum (host-computed)
    :param grid_info: static (th, tw, sh, sw, ph, pw) — logical geometry
    :param batch: images per tile coordinate (the original batch B)
    :param out_dtype: canvas dtype (default: the tile dtype). The blend
        accumulates in f32 regardless; ``out_dtype=float32`` on bf16
        tiles writes that accumulator directly — one less full-canvas
        cast pass than blending to bf16 and upcasting, and no double
        rounding.
    :returns: blended canvas, clipped to [0, 1] —
        still padded (caller crops to the original size)
    """
    th, tw, sh, sw, ph, pw = grid_info
    csz = tiles.shape[1]
    oh, ow = ph - sh, pw - sw
    ow_span = _lane_span(ow)
    if ow > 0 and sw + ow_span > tiles.shape[-1]:
        raise ValueError(
            f"column overlap {ow} needs a lane-padded tile batch of width "
            f">= {sw + ow_span}, got {tiles.shape[-1]} (produce with "
            f"pad_lanes=True or use the XLA overlap-add)")
    hp = (th - 1) * sh + ph
    wp = (tw - 1) * sw + pw
    nbh = th + (1 if oh else 0)
    nbw = tw + (1 if ow else 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(batch, nbh, nbw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((ph, pw), lambda b, i, j: (0, 0)),
            pl.BlockSpec((sh, sw), lambda b, i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((1, csz, sh, sw),
                               lambda b, i, j: (b, 0, i, j)),
        scratch_shapes=[
            pltpu.VMEM((csz, sh, sw), jnp.float32),
            pltpu.VMEM((csz, sh, sw), tiles.dtype),
            pltpu.VMEM((csz, max(oh, 1), sw), tiles.dtype),
            pltpu.VMEM((csz, sh, max(ow_span, 1)), tiles.dtype),
            pltpu.VMEM((csz, max(oh, 1), max(ow_span, 1)), tiles.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _make_kernel(batch, th, tw, sh, sw, ph, pw, csz),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, csz, hp, wp),
                                       out_dtype or tiles.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(tiles, window.astype(jnp.float32), inv_wsum.astype(jnp.float32))
