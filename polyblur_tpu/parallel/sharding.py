"""Multi-chip scale-out: sharded tiles and batches over a device mesh.

The reference is strictly single-device (SURVEY.md §2.6) — its only scale
axes are the batch dim and the overlapping-tile dim of the patch engine
(deblurring.py:269-340). Here those axes become sharded axes of a
``jax.sharding.Mesh``:

* ``data`` axis — batch elements (DP; rides DCN across hosts)
* ``tile`` axis — spatial tiles of the patch engine (the sequence-parallel
  analog; rides ICI within a pod)

Tiles are cut from the replicate-padded source with a full conv apron, so
per-tile deblurring needs NO halo exchange — the design keeps the whole
pipeline collective-free until the final windowed overlap-add, where XLA
inserts the (single) reassembly collective on the scatter-add. This matches
the reference's "redundant compute, zero comms" overlap policy (SURVEY.md
§5.7) and is the right trade on TPU: the apron is 12 px of a 400 px tile
(~6% extra compute) versus an ICI round-trip per iteration.

Inference paths use ``shard_map`` (per-shard local shapes — required for
the Pallas kernels, which GSPMD cannot auto-partition); the training step
uses jit + ``NamedSharding`` (its fft/remat path is pure XLA) with the
gradient psum inserted by GSPMD.
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

def _shard_map(f, mesh, in_specs, out_specs):
    """shard_map across jax versions; replication checking off (the Pallas
    custom-call outputs carry no vma/rep metadata)."""
    if hasattr(jax, "shard_map"):
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    from jax.experimental.shard_map import shard_map as _sm

    return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
               check_rep=False)

from ..patches import plan_patch_grid, extract_patches, overlap_add
from ..pipeline import polyblur_core

__all__ = ["make_mesh", "deblur_sharded", "deblur_sharded_reassembly",
           "assemble_bands", "training_step", "make_sharded_train_step",
           "data_parallel_deblur"]


def make_mesh(devices=None, data_axis: int = 1) -> Mesh:
    """Build a ('data', 'tile') mesh over the given (or all) devices.

    ``data_axis`` is the size of the batch-parallel axis; the rest of the
    devices go to the tile axis.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % data_axis != 0:
        raise ValueError(f"{n} devices not divisible by data_axis={data_axis}")
    dev_array = np.asarray(devices).reshape(data_axis, n // data_axis)
    return Mesh(dev_array, axis_names=("data", "tile"))


def _pad_to_multiple(n_tiles: int, shard: int) -> int:
    return int(math.ceil(n_tiles / shard) * shard)


def deblur_sharded(images: jnp.ndarray, mesh: Mesh, patch_size: int = 400,
                   overlap: float = 0.25, window_type: str = "kaiser",
                   **polyblur_kwargs) -> jnp.ndarray:
    """Patch-engine deblurring with the tile batch sharded over the mesh.

    :param images: (B, C, H, W); B must be divisible by the 'data' axis
    :return: (B, C, H', W') restored images (even-cropped like the
        reference, deblurring.py:273-279)

    The tile axis is zero-padded up to a multiple of the tile-shard count
    (static shapes under jit); padding tiles are deblurred redundantly and
    dropped at overlap-add — wasted work only when T % shards != 0.
    """
    b, c, h, w = images.shape
    grid = plan_patch_grid(h, w, patch_size, overlap)
    n_tiles = len(grid.coords)
    # The T*B axis is flattened over BOTH mesh axes (P(('data','tile'))),
    # so it must divide the total device count, not just the tile axis.
    shards = mesh.shape["data"] * mesh.shape["tile"]
    n_padded = _pad_to_multiple(n_tiles * b, shards)

    tiles = extract_patches(images, grid)  # (T*B, C, ph, pw)
    if n_padded != n_tiles * b:
        pad = jnp.zeros((n_padded - n_tiles * b,) + tiles.shape[1:],
                        tiles.dtype)
        tiles = jnp.concatenate([tiles, pad], axis=0)

    tiles = jax.device_put(
        tiles, NamedSharding(mesh, P(("data", "tile"), None, None, None)))

    # shard_map (not GSPMD auto-partitioning): each device runs the whole
    # pipeline on its local tile shard — Pallas kernels see local shapes,
    # so the mega/fused kernels work unchanged under multi-chip. No
    # collectives are needed (tiles are embarrassingly parallel until the
    # overlap-add reassembly below).
    local_fn = partial(polyblur_core, **polyblur_kwargs)
    restored = jax.jit(_shard_map(
        local_fn, mesh,
        P(("data", "tile"), None, None, None),
        P(("data", "tile"), None, None, None),
    ))(tiles)

    restored = restored[: n_tiles * b]
    return overlap_add(restored, grid, b, window_type)


def data_parallel_deblur(images: jnp.ndarray, mesh: Mesh,
                         **polyblur_kwargs) -> jnp.ndarray:
    """Whole-image pipeline with the batch axis sharded over every mesh
    device (DP only — embarrassingly parallel, zero collectives).
    shard_map so Pallas kernels run on local shards."""
    spec = NamedSharding(mesh, P(("data", "tile"), None, None, None))
    images = jax.device_put(images, spec)
    return jax.jit(_shard_map(
        partial(polyblur_core, **polyblur_kwargs), mesh,
        P(("data", "tile"), None, None, None),
        P(("data", "tile"), None, None, None),
    ))(images)


def training_step(params: dict, blurry: jnp.ndarray, sharp: jnp.ndarray,
                  mesh: Mesh, lr: float = 1e-3, n_iter: int = 2,
                  method: str = "direct_separable"):
    """One SGD step through the differentiable deblurring layer.

    The training-layer use case (reference README.md:69-80, BASELINE
    config 5): learn the pipeline parameters (c, b, alpha, beta) by
    back-propagating an L2 restoration loss through ``n_iter`` scanned
    Polyblur iterations. Batch is sharded over the whole mesh; XLA inserts
    the gradient ``psum`` (this is the DP collective).

    :param params: dict with scalar leaves c, b, alpha, beta
    :return: (new_params, loss)
    """
    batch_spec = NamedSharding(mesh, P("data", None, None, None))
    replicated = NamedSharding(mesh, P())
    blurry = jax.device_put(blurry, batch_spec)
    sharp = jax.device_put(sharp, batch_spec)
    params = jax.device_put(params, replicated)

    @partial(jax.jit, static_argnames=("n_iter", "method"),
             in_shardings=(replicated, batch_spec, batch_spec),
             out_shardings=(replicated, replicated))
    def step(p, x, y, n_iter=n_iter, method=method):
        def loss_fn(p):
            out = polyblur_core(x, n_iter=n_iter, c=p["c"], b=p["b"],
                                alpha=p["alpha"], beta=p["beta"],
                                method=method, remat=True)
            return jnp.mean((out - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        new_p = jax.tree.map(lambda w, g: w - lr * g, p, grads)
        return new_p, loss

    return step(params, blurry, sharp)


def make_sharded_train_step(optimizer, mesh: Mesh, n_iter: int = 2,
                            method: str = "direct_separable"):
    """Sharded optax training step factory (the stateful-optimizer analog
    of :func:`training_step`).

    Parameters and optimizer state (e.g. Adam moments) are replicated over
    the mesh; the batch is sharded over the 'data' axis; GSPMD inserts the
    gradient ``psum``. Returns ``step(params, opt_state, blurry, sharp) ->
    (params, opt_state, loss)``, jitted with explicit in/out shardings so
    the replication of the optimizer state is compiler-enforced.
    """
    import optax

    batch_spec = NamedSharding(mesh, P("data", None, None, None))
    replicated = NamedSharding(mesh, P())

    @partial(jax.jit,
             in_shardings=(replicated, replicated, batch_spec, batch_spec),
             out_shardings=(replicated, replicated, replicated))
    def step(params, opt_state, x, y):
        def loss_fn(p):
            out = polyblur_core(x, n_iter=n_iter, c=p["c"], b=p["b"],
                                alpha=p["alpha"], beta=p["beta"],
                                method=method, remat=True)
            return jnp.mean((out - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def run(params, opt_state, blurry, sharp):
        return step(jax.device_put(params, replicated),
                    jax.device_put(opt_state, replicated),
                    jax.device_put(blurry, batch_spec),
                    jax.device_put(sharp, batch_spec))

    return run


def deblur_sharded_reassembly(images: jnp.ndarray, mesh: Mesh,
                              patch_size: int = 400, overlap: float = 0.25,
                              window_type: str = "kaiser",
                              **polyblur_kwargs):
    """Patch-engine deblurring whose OUTPUT STAYS SHARDED (SURVEY §5.7's
    sharded-reassembly alternative to :func:`deblur_sharded`).

    Tile ROWS are sharded over the mesh's 'tile' axis and the batch over
    'data'. Each device restores its local tiles, overlap-adds them into
    its local canvas band (reshape decomposition, no scatter chain), then
    exchanges ONE seam strip (the ``ph - step`` overlap rows) with its +1
    neighbour via ``jax.lax.ppermute`` — the only collective; it rides ICI
    between tile shards. The result is a (tile_shards, B_local-stacked)
    banded representation that never materializes the gathered image;
    :func:`assemble_bands` does the final (pure-slicing) concatenation
    when a host-side image is wanted.

    :return: ``(bands, meta)`` — bands is (S, B, C, band_h, W_pad) sharded
        ``P('tile', 'data')``; meta carries the static plan for
        :func:`assemble_bands`.
    """
    from ..utils.imaging import build_window_np
    from ..patches import _grid_steps, _join_axis

    b, c, h, w = images.shape
    grid = plan_patch_grid(h, w, patch_size, overlap)
    reg = _grid_steps(grid)
    if reg is None:
        raise ValueError("sharded reassembly needs a regular tile grid")
    th, tw, sh_, sw_ = reg
    ph, pw = grid.patch_size
    S = mesh.shape["tile"]
    if th % S != 0:
        raise ValueError(f"{th} tile rows not divisible by tile axis {S}")
    if b % mesh.shape["data"] != 0:
        raise ValueError(f"batch {b} not divisible by data axis")
    thl = th // S
    band = (thl - 1) * sh_ + ph
    tail = ph - sh_
    H, W = grid.padded_size

    tiles = extract_patches(images, grid)  # (T*B, C, ph, pw)
    tiles = tiles.reshape(th, tw, b, c, ph, pw)
    tiles = jnp.moveaxis(tiles, 2, 1)      # (th, B, tw, C, ph, pw)

    window_np = build_window_np((ph, pw), window_type)
    window = jnp.asarray(window_np).astype(images.dtype)
    wsum_np = np.zeros((H + tail, W), np.float64)
    for (i0, j0) in grid.coords:
        wsum_np[i0:i0 + ph, j0:j0 + pw] += window_np
    bands_w = np.stack([
        wsum_np[d * thl * sh_: d * thl * sh_ + band] for d in range(S)
    ]).astype(np.float32)  # (S, band, W)
    bands_w = jnp.asarray(bands_w)

    def local_fn(tiles_l, wsum_l):
        # tiles_l (thl, B_l, tw, C, ph, pw); wsum_l (1, band, W)
        t_l, b_l = tiles_l.shape[0], tiles_l.shape[1]
        flat = tiles_l.reshape(t_l * b_l * tw, c, ph, pw)
        restored = polyblur_core(flat, **polyblur_kwargs)
        rest = restored.reshape(t_l, b_l, tw, c, ph, pw) \
            * window.astype(restored.dtype)
        # reshape-decomposition overlap-add (patches._join_axis): columns
        # then local rows -> (B_l, C, band, W)
        t6 = jnp.moveaxis(rest, 2, 0)            # (tw, thl, B_l, C, ph, pw)
        joined = _join_axis(t6, sw_, pw, axis=4)  # (thl, B_l, C, ph, W)
        canvas = _join_axis(joined, sh_, ph, axis=2)  # (B_l, C, band, W)
        # seam exchange: my TAIL rows overlap the next shard's head
        strip = canvas[:, :, band - tail:]
        perm = [(i, i + 1) for i in range(S - 1)]
        recv = jax.lax.ppermute(strip, "tile", perm)
        canvas = canvas.at[:, :, :tail].add(recv)
        canvas = canvas / (wsum_l + 1e-8).astype(canvas.dtype)
        return jnp.clip(canvas, 0.0, 1.0)[None]

    bands = jax.jit(_shard_map(
        local_fn, mesh,
        (P("tile", "data", None, None, None, None), P("tile", None, None)),
        P("tile", "data", None, None, None),
    ))(tiles, bands_w[:, None])
    meta = dict(grid=grid, thl=thl, step_h=sh_, band=band, tail=tail,
                orig=grid.orig_size, pad=grid.pad)
    return bands, meta


def assemble_bands(bands, meta) -> jnp.ndarray:
    """Concatenate the sharded bands of
    :func:`deblur_sharded_reassembly` into a (B, C, h, w) image.

    Pure slicing: seams were already exchanged on-device, so band d
    contributes its first ``thl*step`` rows (its tail rows are the next
    band's completed head), the last band contributes everything.
    """
    s = bands.shape[0]
    keep = meta["thl"] * meta["step_h"]
    parts = [bands[d, :, :, :keep] for d in range(s - 1)] + [bands[s - 1]]
    canvas = jnp.concatenate(parts, axis=2)
    pt, pb, pl_, pr_ = meta["pad"]
    h, w = meta["orig"]
    return canvas[:, :, pt:pt + h, pl_:pl_ + w]
