"""Overlapping-patch engine: tiled deblurring with windowed overlap-add.

TPU-native rewrite of the reference's patch decomposition
(/root/reference/polyblur/deblurring.py:266-394, with the undefined
``handling_saturation`` crash of :289 fixed — see SURVEY.md section 2.4).

Tiles become a leading batch axis (the scale-out axis for ``shard_map`` in
parallel/sharding.py): the image is padded to a tile grid, all tiles are
gathered with static offsets, deblurred as one batch, and blended back by a
Kaiser-windowed overlap-add. On the regular grids plan_patch_grid produces,
both directions use a reshape decomposition (tile starts are multiples of
the step, so the leading ``step`` columns of the tiles tile the axis
exactly and the overlap columns are the same decomposition shifted once) —
no per-tile slice or scatter chains; irregular grids fall back to
static-index scatter-add.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .utils.imaging import build_window_np

__all__ = ["PatchGrid", "plan_patch_grid", "extract_patches",
           "overlap_add", "deblur_patches"]


class PatchGrid(NamedTuple):
    """Static tiling plan (everything here is Python-level / compile-time)."""
    orig_size: tuple          # (h, w) after the even-crop
    padded_size: tuple        # (H, W) of the padded canvas
    patch_size: tuple         # (ph, pw)
    coords: tuple             # ((i0, j0), ...) top-left corners
    pad: tuple                # (top, bottom, left, right)


def plan_patch_grid(h: int, w: int, patch_size=400,
                    overlap=0.25) -> PatchGrid:
    """Compute the tile grid of deblurring.py:281-298 (static shapes only).

    ``patch_size`` / ``overlap`` accept an int/float (square tiles — the
    reference's surface) or an ``(h, w)`` pair. Rectangular tiles are a
    TPU extension: the spectral mega kernel's y-DFT matmuls scale with
    tile HEIGHT squared but its x-rDFT only linearly with width, so
    short-wide tiles (e.g. 320x448) cut FLOPs/output-px vs squares at
    equal seam width (measured sweep: tools/grid_ab.py,
    docs/ROUND5_NOTES.md)."""
    h -= h % 2
    w -= w % 2
    ph, pw = ((patch_size, patch_size) if isinstance(patch_size, int)
              else (int(patch_size[0]), int(patch_size[1])))
    ov_h, ov_w = ((overlap, overlap) if isinstance(overlap, (int, float))
                  else (overlap[0], overlap[1]))
    step_h = int(ph * (1.0 - ov_h))
    step_w = int(pw * (1.0 - ov_w))
    new_h = int(math.ceil(max(h - ph, 0) / step_h) * step_h) + ph
    new_w = int(math.ceil(max(w - pw, 0) / step_w) * step_w) + pw
    pad_top = (new_h - h) // 2
    pad_bottom = new_h - h - pad_top
    pad_left = (new_w - w) // 2
    pad_right = new_w - w - pad_left
    coords = tuple(
        (int(i), int(j))
        for i in np.arange(0, new_h - ph + 1, step_h)
        for j in np.arange(0, new_w - pw + 1, step_w)
    )
    return PatchGrid((h, w), (new_h, new_w), (ph, pw), coords,
                     (pad_top, pad_bottom, pad_left, pad_right))


def _grid_steps(grid: PatchGrid):
    """(Th, Tw, step_h, step_w) if the tile grid is regular and the overlap
    is at most 50% per axis (both always true for plan_patch_grid's output
    at the reference's overlap range), else None."""
    ph, pw = grid.patch_size
    H, W = grid.padded_size
    rows = sorted({i for (i, _) in grid.coords})
    cols = sorted({j for (_, j) in grid.coords})
    if len(grid.coords) != len(rows) * len(cols):
        return None
    step_h = rows[1] - rows[0] if len(rows) > 1 else ph
    step_w = cols[1] - cols[0] if len(cols) > 1 else pw
    if rows != [k * step_h for k in range(len(rows))]:
        return None
    if cols != [k * step_w for k in range(len(cols))]:
        return None
    if not (ph // 2 <= step_h <= ph and pw // 2 <= step_w <= pw):
        return None
    if (len(rows) - 1) * step_h + ph != H or (len(cols) - 1) * step_w + pw != W:
        return None
    return len(rows), len(cols), step_h, step_w


def _split_axis(x: jnp.ndarray, T: int, s: int, p: int, axis: int):
    """out[k] = x[..., k*s : k*s+p, ...] along ``axis`` -> new leading tile
    axis (T, ...). Pure reshapes + one shifted reshape — no gathers and no
    per-tile slicing (the tile starts are multiples of s, so the left s
    columns of every tile tile the axis exactly, and the remaining p-s
    columns are the same decomposition shifted by s)."""
    o = p - s
    axis = axis % x.ndim
    if axis == x.ndim - 2:
        # Sublane-axis (H) variant: operate in place of the second-minor
        # axis so the lane (W) axis never moves — the generic form below
        # would transpose the whole canvas into lane-major twice, a real
        # relayout on TPU (the leading moveaxis here only permutes major
        # dims, which is a tile copy).
        w = x.shape[-1]
        lead = x.shape[:-2]
        nd = [(0, 0)] * x.ndim
        lefts = x[..., :T * s, :].reshape(lead + (T, s, w))
        parts = [lefts]
        if o:
            y = x[..., s:, :]
            pad = T * s - y.shape[-2]
            if pad > 0:
                nd[-2] = (0, pad)
                y = jnp.pad(y, nd)
            parts.append(
                y[..., :T * s, :].reshape(lead + (T, s, w))[..., :o, :])
        out = (jnp.concatenate(parts, axis=-2) if len(parts) > 1
               else parts[0])                 # (..., T, p, W)
        return jnp.moveaxis(out, -3, 0)       # (T, ..., p, W)
    x = jnp.moveaxis(x, axis, -1)
    lead = x.shape[:-1]
    lefts = x[..., :T * s].reshape(lead + (T, s))
    parts = [lefts]
    if o:
        y = x[..., s:]
        pad = T * s - y.shape[-1]
        if pad > 0:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, pad)])
        parts.append(y[..., :T * s].reshape(lead + (T, s))[..., :o])
    out = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
    out = jnp.moveaxis(out, -2, 0)           # (T, ..., p)
    return jnp.moveaxis(out, -1, axis + 1)   # p back at the original axis


def _join_axis(tiles: jnp.ndarray, s: int, p: int, axis: int) -> jnp.ndarray:
    """Inverse of :func:`_split_axis` with summation on the overlaps:
    canvas[..., k*s+i, ...] += tiles[k][..., i, ...]. One reshape per half
    plus one shifted add — no scatter chain."""
    o = p - s
    T = tiles.shape[0]
    axis = axis % (tiles.ndim - 1)  # axis in the per-tile layout
    if axis + 1 == tiles.ndim - 2:
        # Sublane-axis (H) variant, mirror of _split_axis: keep the lane
        # (W) axis in place and only permute major dims.
        w = tiles.shape[-1]
        x = jnp.moveaxis(tiles, 0, -3)         # (..., T, p, W)
        lead = x.shape[:-3]
        L = T * s + o
        nd = [(0, 0)] * (len(lead) + 2)
        lefts = x[..., :s, :].reshape(lead + (T * s, w))
        nd[-2] = (0, o)
        canvas = jnp.pad(lefts, nd)
        if o:
            nd2 = [(0, 0)] * (len(lead) + 3)
            nd2[-2] = (0, s - o)
            rights = jnp.pad(x[..., s:, :], nd2)
            rights = rights.reshape(lead + (T * s, w))[..., :L - s, :]
            nd[-2] = (s, 0)
            canvas = canvas + jnp.pad(rights, nd)
        return canvas                          # joined axis back in place
    x = jnp.moveaxis(tiles, axis + 1, -1)  # (T, ..., p)
    x = jnp.moveaxis(x, 0, -2)             # (..., T, p)
    lead = x.shape[:-2]
    L = T * s + o
    lefts = x[..., :s].reshape(lead + (T * s,))
    canvas = jnp.pad(lefts, [(0, 0)] * (len(lead)) + [(0, o)])
    if o:
        rights = jnp.pad(x[..., s:], [(0, 0)] * (len(lead) + 1) + [(0, s - o)])
        rights = rights.reshape(lead + (T * s,))[..., :L - s]
        canvas = canvas + jnp.pad(
            rights, [(0, 0)] * (len(lead)) + [(s, 0)])
    return jnp.moveaxis(canvas, -1, axis)


def _fused_oa_ok(reg, patch_size, tiles_lane: int) -> bool:
    """Static eligibility of the fused Pallas overlap-add: TPU backend, a
    regular grid on (8, 128) Mosaic boundaries, and a tile batch wide
    enough for the trailing-column DMA span (lane-padded producer, or a
    column overlap that is already a lane multiple)."""
    if reg is None or jax.default_backend() != "tpu":
        return False
    ph, pw = patch_size
    th, tw, sh, sw = reg
    if sh % 8 != 0 or sw % 128 != 0 or ph % 8 != 0:
        return False
    ow = pw - sw
    ow_span = -(-ow // 128) * 128
    return ow == 0 or sw + ow_span <= tiles_lane


def extract_patches(images: jnp.ndarray, grid: PatchGrid) -> jnp.ndarray:
    """(B, C, H, W) -> (T*B, C, ph, pw) tile batch (T = number of tiles).

    Regular grids (always, for plan_patch_grid output) use the reshape
    decomposition of :func:`_split_axis` — XLA lowers it to a handful of
    copies instead of T strided slices."""
    h, w = grid.orig_size
    images = images[..., :h, :w]  # even-crop (deblurring.py:273-279)
    pt, pb, pl, pr = grid.pad
    padded = jnp.pad(images, ((0, 0), (0, 0), (pt, pb), (pl, pr)), mode="edge")
    ph, pw = grid.patch_size
    reg = _grid_steps(grid)
    if reg is not None:
        th, tw, sh, sw = reg
        rows = _split_axis(padded, th, sh, ph, axis=2)   # (Th, B, C, ph, W)
        tiles = _split_axis(rows, tw, sw, pw, axis=4)    # (Tw, Th, B, C, ph, pw)
        tiles = jnp.swapaxes(tiles, 0, 1)                # (Th, Tw, ...)
        tiles = tiles.reshape((-1,) + tiles.shape[2:])   # (T, B, C, ph, pw)
    else:
        tiles = jnp.stack(
            [padded[..., i0:i0 + ph, j0:j0 + pw] for (i0, j0) in grid.coords]
        )  # (T, B, C, ph, pw)
    return tiles.reshape((-1,) + tiles.shape[2:])


def overlap_add(patches: jnp.ndarray, grid: PatchGrid, batch: int,
                window_type: str = "kaiser", out_dtype=None) -> jnp.ndarray:
    """Blend (T*B, C, ph, pw) tiles back into (B, C, h, w).

    Regular grids take the :func:`_join_axis` reshape decomposition (a
    couple of copies + one shifted add per axis) instead of a T-step
    scatter-add chain; the window-sum normalizer is a host-computed
    constant either way.

    :param out_dtype: canvas dtype (default: the tile dtype). On the
        fused route the blend accumulates in f32 regardless, so
        ``out_dtype=float32`` over bf16 tiles is strictly better than
        blending to bf16 and upcasting (one less full-canvas pass, no
        double rounding)."""
    ph, pw = grid.patch_size
    H, W = grid.padded_size
    c = patches.shape[1]
    window_np = build_window_np((ph, pw), window_type)

    reg = _grid_steps(grid)
    if _fused_oa_ok(reg, (ph, pw), patches.shape[-1]):
        # Fused single-pass blend: one Pallas program per OUTPUT block
        # gathers its <=4 overlapping tiles via DMA, windows, normalizes
        # and clips in VMEM — read tiles once + write canvas once instead
        # of the multi-pass XLA join below (~2.4 ms -> ~0.3 ms at 12MP).
        # Steps must sit on (8, 128) Mosaic tile boundaries.
        from .ops.pallas.overlap_add import overlap_add_fused
        from .utils.profiling import record_dispatch

        record_dispatch("overlap_add", "pallas_fused")
        th, tw, sh, sw = reg
        wsum_np = np.zeros((H, W), np.float64)
        for (i0, j0) in grid.coords:
            wsum_np[i0:i0 + ph, j0:j0 + pw] += window_np
        inv_wsum = jnp.asarray(1.0 / (wsum_np + 1e-8), jnp.float32)
        out = overlap_add_fused(patches, jnp.asarray(window_np), inv_wsum,
                                (th, tw, sh, sw, ph, pw), batch,
                                out_dtype=out_dtype)
        pt, pb, pl, pr = grid.pad
        h, w = grid.orig_size
        return out[..., pt:pt + h, pl:pl + w]

    from .utils.profiling import record_dispatch

    record_dispatch("overlap_add", "xla_join")
    # Blend in the WIDEST of tile/output dtype (the fused route always
    # accumulates in f32): a narrower out_dtype (e.g. bf16 over f32
    # tiles) must round only the final canvas, never the blend itself.
    blend_dt = patches.dtype
    if out_dtype is not None and jnp.finfo(out_dtype).bits > jnp.finfo(
            blend_dt).bits:
        blend_dt = jnp.dtype(out_dtype)
    patches = patches.astype(blend_dt)
    window = jnp.asarray(window_np).astype(blend_dt)
    patches = patches[..., :pw]  # drop producer lane padding, if any
    tiles = patches.reshape(len(grid.coords), batch, c, ph, pw) * window

    if reg is not None:
        th, tw, sh, sw = reg
        t6 = jnp.swapaxes(tiles.reshape(th, tw, batch, c, ph, pw), 0, 1)
        joined = _join_axis(t6, sw, pw, axis=4)   # (Th, B, C, ph, W)
        out = _join_axis(joined, sh, ph, axis=2)  # (B, C, H, W)
    else:
        out = jnp.zeros((batch, c, H, W), patches.dtype)
        for t, (i0, j0) in enumerate(grid.coords):
            out = out.at[..., i0:i0 + ph, j0:j0 + pw].add(tiles[t])

    wsum_np = np.zeros((H, W), np.float64)
    for (i0, j0) in grid.coords:
        wsum_np[i0:i0 + ph, j0:j0 + pw] += window_np
    # host-side reciprocal: the device does one multiply, not a divide
    inv_wsum = jnp.asarray(1.0 / (wsum_np[None, None] + 1e-8),
                           jnp.float32).astype(patches.dtype)
    out = jnp.clip(out * inv_wsum, 0.0, 1.0)
    if out_dtype is not None and out.dtype != jnp.dtype(out_dtype):
        out = out.astype(out_dtype)
    pt, pb, pl, pr = grid.pad
    h, w = grid.orig_size
    return out[..., pt:pt + h, pl:pl + w]


#: Row-strip ring VMEM budget of the blended mega route: one (oh, pw) f32
#: strip per tile column per channel must stay VMEM-resident across
#: programs.
_BLEND_STRIP_BUDGET = 8 * 1024 * 1024


def _edge_pad_to(images, crop_hw, pads, work_dtype=None,
                 interpret: bool = False):
    """Even-crop + edge-pad + optional working-dtype cast for the mega
    routes' canvases, in ONE device pass when possible.

    On TPU (or in interpret mode) the fused Pallas kernel
    (:mod:`.ops.pallas.pad_cast`) streams the image once — the f32->bf16
    serving cast rides the pad's HBM pass instead of a separate
    full-image copy (~0.4 ms at 12MP). Results are bit-identical to the
    ``jnp.pad(x.astype(dt), mode='edge')`` fallback: replicate-pad
    commutes with elementwise cast."""
    h, w = crop_hw
    x = images[..., :h, :w]
    odt = jnp.dtype(work_dtype) if work_dtype is not None else x.dtype
    from .ops.pallas.pad_cast import edge_pad_cast, edge_pad_cast_ok
    from .utils.profiling import record_dispatch

    if ((jax.default_backend() == "tpu" or interpret)
            and edge_pad_cast_ok(h, w, pads)):
        record_dispatch("edge_pad", "pallas_pad_cast")
        # positional: custom_vjp nondiff args may not be passed by keyword
        return edge_pad_cast(x, tuple(int(p) for p in pads), odt, interpret)
    record_dispatch("edge_pad", "xla_pad")
    return jnp.pad(x.astype(odt),
                   ((0, 0), (0, 0), (pads[0], pads[1]), (pads[2], pads[3])),
                   mode="edge")


def _try_blended_mega(images, grid: PatchGrid, grid_info, b: int,
                      window_type: str, out_dtype, work_dtype,
                      polyblur_kwargs):
    """Run the fully-fused blended mega route (tile cut + N iterations +
    windowed overlap-add in ONE Pallas call) if this configuration admits
    it, else return None.

    Requirements beyond the DMA mega route: batch 1 (the in-kernel
    neighbour strips assume tile-major sequential programs), statically
    (8, 128)-aligned steps with ph % 8 == 0 (the output canvas is tiled
    in (sh, sw) blocks), bottom/right pad at least the overlap (the
    original content must lie inside the th*sh x tw*sw block canvas), and
    a bounded row-strip ring.
    """
    from .pipeline import mega_padded_eligible

    th, tw, sh, sw, ph, pw = grid_info
    oh, ow = ph - sh, pw - sw
    pt, pb, pl, pr = grid.pad
    c = images.shape[1]
    if not (b == 1
            and sh % 8 == 0 and sw % 128 == 0 and ph % 8 == 0
            and pb >= oh and pr >= ow
            and tw * c * max(oh, 1) * pw * 4 <= _BLEND_STRIP_BUDGET
            and mega_padded_eligible(grid_info, **polyblur_kwargs)):
        return None
    from .ops.pallas.polyblur_fused import polyblur_image_blended
    from .utils.profiling import record_dispatch

    record_dispatch("deblur_patches", "mega_image_blended")
    h, w = grid.orig_size
    H, W = grid.padded_size
    # pad straight to the kernel's enclosing-DMA-window canvas so the
    # kernel adds no second full-canvas copy
    from .ops.pallas.polyblur_fused import dma_canvas_size

    hc, wc = dma_canvas_size(grid_info)
    padded = _edge_pad_to(
        images, (h, w),
        (pt, pb + max(0, hc - H), pl, pr + max(0, wc - W)),
        work_dtype=work_dtype,
        interpret=polyblur_kwargs.get("_mega_interpret", False))
    window_np = build_window_np((ph, pw), window_type)
    wsum_np = np.zeros((H, W), np.float64)
    for (i0, j0) in grid.coords:
        wsum_np[i0:i0 + ph, j0:j0 + pw] += window_np
    inv_wsum = jnp.asarray(
        1.0 / (wsum_np[:th * sh, :tw * sw] + 1e-8), jnp.float32)
    kw = dict(polyblur_kwargs)
    n_iter = kw.pop("n_iter", 1)
    from .pipeline import _mega_pack

    coeffs = _mega_pack(kw.pop("c", 0.352), kw.pop("b", 0.768),
                        kw.pop("alpha", 2.0), kw.pop("beta", 3.0),
                        kw.pop("sigma_s", 2.0), kw.pop("sigma_r", 0.8))
    prefilter = None
    if kw.get("prefiltering", False):
        prefilter = ("dt" if kw.get("smoother") == "domain_transform"
                     else "bilateral")
    canvas = polyblur_image_blended(
        padded, coeffs, n_iter, grid_info, jnp.asarray(window_np),
        inv_wsum, do_taper=kw.get("edgetaping", False),
        do_halo=kw.get("remove_halo", False), prefilter=prefilter,
        interpret=kw.get("_mega_interpret", False), out_dtype=out_dtype)
    return canvas[..., pt:pt + h, pl:pl + w]


def deblur_patches(images: jnp.ndarray, patch_size=400,
                   overlap=0.25, window_type: str = "kaiser",
                   batch_size: Optional[int] = None, out_dtype=None,
                   work_dtype=None, _disable_blended: bool = False,
                   **polyblur_kwargs) -> jnp.ndarray:
    """Whole patch path: tile -> deblur -> overlap-add.

    :param out_dtype: output canvas dtype (default: the working dtype);
        ``float32`` over bf16 inputs writes the blend's f32 accumulator
        directly instead of a separate upcast pass (see
        :func:`overlap_add`).
    :param work_dtype: dtype the tile pipeline computes in (default: the
        input dtype). Passing an f32 image with ``work_dtype=bfloat16``
        is the serving configuration: the cast rides the canvas edge-pad's
        single HBM pass (:func:`_edge_pad_to`) instead of a separate
        full-image copy, and is bit-identical to casting up front.
    :param batch_size: maximum number of tile coordinates deblurred per
        device batch — the memory ceiling of the reference's sequential host
        loop (deblurring.py:310-336), realised here as a ``lax.scan`` over
        fixed-size chunks so live memory is bounded by one chunk's working
        set while the whole path stays one compiled program. ``None`` (or
        ``>= n_tiles``) processes every tile as a single device batch, the
        throughput-optimal setting on TPU.
    """
    from .pipeline import (polyblur_core, mega_restore_padded,
                           mega_padded_eligible)

    b = images.shape[0]
    h, w = images.shape[-2:]
    grid = plan_patch_grid(h, w, patch_size, overlap)
    n_tiles = len(grid.coords)

    reg = _grid_steps(grid)
    if reg is not None and (batch_size is None or batch_size <= 0
                            or batch_size >= n_tiles):
        th, tw, sh, sw = reg
        ph, pw = grid.patch_size
        grid_info = (th, tw, sh, sw, ph, pw)
        if not _disable_blended:
            blended = _try_blended_mega(images, grid, grid_info, b,
                                        window_type, out_dtype,
                                        work_dtype, polyblur_kwargs)
            if blended is not None:
                return blended
        if mega_padded_eligible(grid_info, **polyblur_kwargs):
            # Fully-fused route: the mega kernel DMAs each tile window out
            # of the padded canvas itself — no extracted tile tensor in HBM
            # (eligibility checked first so a fallback pays no wasted pad).
            # When the fused overlap-add will consume the tiles, ask the
            # kernel for lane-padded output so the blend's trailing-column
            # DMA spans stay in bounds (free: HBM buffers are lane-padded
            # to 128 anyway).
            pad_lanes = _fused_oa_ok((th, tw, sh, sw), (ph, pw),
                                     -(-pw // 128) * 128)
            hh, ww = grid.orig_size
            pt, pb, pl, pr = grid.pad
            from .ops.pallas.polyblur_fused import dma_canvas_size

            hc, wc = dma_canvas_size(grid_info)
            H_, W_ = grid.padded_size
            padded = _edge_pad_to(
                images, (hh, ww),
                (pt, pb + max(0, hc - H_), pl, pr + max(0, wc - W_)),
                work_dtype=work_dtype,
                interpret=polyblur_kwargs.get("_mega_interpret", False))
            restored = mega_restore_padded(padded, grid_info,
                                           pad_lanes=pad_lanes,
                                           **polyblur_kwargs)
            if restored is not None:  # predicate drift safety
                return overlap_add(restored, grid, b, window_type,
                                   out_dtype=out_dtype)

    if work_dtype is not None:
        images = images.astype(work_dtype)
    tiles = extract_patches(images, grid)
    if batch_size is None or batch_size <= 0 or batch_size >= n_tiles:
        restored = polyblur_core(tiles, **polyblur_kwargs)
    else:
        # Chunk by whole tile coordinates: tiles is laid out (T, B, ...)
        # flattened, so a chunk of `batch_size` coords is batch_size*b rows
        # (matching the reference's cat-of-batch_size-coords semantics,
        # deblurring.py:312-314).
        chunk = batch_size * b
        pad = (-n_tiles * b) % chunk
        padded = tiles
        if pad:
            padded = jnp.concatenate(
                [tiles, jnp.repeat(tiles[-1:], pad, axis=0)])
        chunks = padded.reshape(-1, chunk, *tiles.shape[1:])
        restored = jax.lax.map(
            lambda t: polyblur_core(t, **polyblur_kwargs), chunks)
        restored = restored.reshape(-1, *tiles.shape[1:])[:n_tiles * b]
    return overlap_add(restored, grid, b, window_type,
                       out_dtype=out_dtype)
