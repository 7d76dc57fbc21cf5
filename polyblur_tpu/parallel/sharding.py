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

__all__ = ["make_mesh", "deblur_sharded", "training_step",
           "make_sharded_train_step", "data_parallel_deblur"]


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
    tile_shards = mesh.shape["tile"]
    n_padded = _pad_to_multiple(n_tiles * b, tile_shards)

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
                  method: str = "fft"):
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
                            method: str = "fft"):
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
