"""Overlapping-patch engine: tiled deblurring with windowed overlap-add.

TPU-native rewrite of the reference's patch decomposition
(/root/reference/polyblur/deblurring.py:266-394, with the undefined
``handling_saturation`` crash of :289 fixed — see SURVEY.md section 2.4).

Tiles become a leading batch axis (the scale-out axis for ``shard_map`` in
parallel/sharding.py): the image is padded to a tile grid, all tiles are
gathered with static offsets, deblurred as one batch, and blended back by a
Kaiser-windowed overlap-add (scatter-add with static indices, which XLA
lowers to in-place dynamic-update-slices).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .utils.imaging import build_window

__all__ = ["PatchGrid", "plan_patch_grid", "extract_patches",
           "overlap_add", "deblur_patches"]


class PatchGrid(NamedTuple):
    """Static tiling plan (everything here is Python-level / compile-time)."""
    orig_size: tuple          # (h, w) after the even-crop
    padded_size: tuple        # (H, W) of the padded canvas
    patch_size: tuple         # (ph, pw)
    coords: tuple             # ((i0, j0), ...) top-left corners
    pad: tuple                # (top, bottom, left, right)


def plan_patch_grid(h: int, w: int, patch_size: int = 400,
                    overlap: float = 0.25) -> PatchGrid:
    """Compute the tile grid of deblurring.py:281-298 (static shapes only)."""
    h -= h % 2
    w -= w % 2
    ph = pw = patch_size
    step_h = int(ph * (1.0 - overlap))
    step_w = int(pw * (1.0 - overlap))
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


def extract_patches(images: jnp.ndarray, grid: PatchGrid) -> jnp.ndarray:
    """(B, C, H, W) -> (T*B, C, ph, pw) tile batch (T = number of tiles)."""
    h, w = grid.orig_size
    images = images[..., :h, :w]  # even-crop (deblurring.py:273-279)
    pt, pb, pl, pr = grid.pad
    padded = jnp.pad(images, ((0, 0), (0, 0), (pt, pb), (pl, pr)), mode="edge")
    ph, pw = grid.patch_size
    tiles = jnp.stack(
        [padded[..., i0:i0 + ph, j0:j0 + pw] for (i0, j0) in grid.coords]
    )  # (T, B, C, ph, pw)
    return tiles.reshape((-1,) + tiles.shape[2:])


def overlap_add(patches: jnp.ndarray, grid: PatchGrid, batch: int,
                window_type: str = "kaiser") -> jnp.ndarray:
    """Blend (T*B, C, ph, pw) tiles back into (B, C, h, w)."""
    ph, pw = grid.patch_size
    H, W = grid.padded_size
    c = patches.shape[1]
    window = build_window((ph, pw), window_type).astype(patches.dtype)
    tiles = patches.reshape(len(grid.coords), batch, c, ph, pw) * window

    out = jnp.zeros((batch, c, H, W), patches.dtype)
    wsum = jnp.zeros((1, 1, H, W), patches.dtype)
    for t, (i0, j0) in enumerate(grid.coords):
        out = out.at[..., i0:i0 + ph, j0:j0 + pw].add(tiles[t])
        wsum = wsum.at[..., i0:i0 + ph, j0:j0 + pw].add(window)
    out = jnp.clip(out / (wsum + 1e-8), 0.0, 1.0)
    pt, pb, pl, pr = grid.pad
    h, w = grid.orig_size
    return out[..., pt:pt + h, pl:pl + w]


def deblur_patches(images: jnp.ndarray, patch_size: int = 400,
                   overlap: float = 0.25, window_type: str = "kaiser",
                   batch_size: Optional[int] = None,
                   **polyblur_kwargs) -> jnp.ndarray:
    """Whole patch path: tile -> deblur -> overlap-add.

    :param batch_size: maximum number of tile coordinates deblurred per
        device batch — the memory ceiling of the reference's sequential host
        loop (deblurring.py:310-336), realised here as a ``lax.scan`` over
        fixed-size chunks so live memory is bounded by one chunk's working
        set while the whole path stays one compiled program. ``None`` (or
        ``>= n_tiles``) processes every tile as a single device batch, the
        throughput-optimal setting on TPU.
    """
    from .pipeline import polyblur_core

    b = images.shape[0]
    h, w = images.shape[-2:]
    grid = plan_patch_grid(h, w, patch_size, overlap)
    tiles = extract_patches(images, grid)
    n_tiles = len(grid.coords)
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
    return overlap_add(restored, grid, b, window_type)
