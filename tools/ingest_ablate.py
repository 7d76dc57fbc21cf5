"""Isolate the DMA-window ingest cost of the image mega kernels vs the
BlockSpec-fed tiles kernel (the round-4 D-A residual, VERDICT r4 weak #2).

All rows run in ONE session on the 12MP bf16 576/512 configuration:

  E2  tiles kernel-only (BlockSpec ingest)             [baseline]
  E1  image DMA kernel-only on the pre-padded canvas   [D row]
  E3  blended kernel-only on the pre-padded canvas
  E5  tiles kernel, ablate=(noest, nodft)              [pure copy]
  E4  image DMA kernel, ablate=(noest, nodft)          [pure ingest+copy]

E4 - E5 is the ingest difference with all compute removed.

Usage (repo root, TPU): PYTHONPATH=/root/repo:/root/.axon_site python tools/ingest_ablate.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from PIL import Image

from polyblur_tpu.pipeline import polyblur_core, _mega_pack
from polyblur_tpu.patches import plan_patch_grid, extract_patches
from polyblur_tpu.ops.pallas import polyblur_fused as pf
from polyblur_tpu.utils.imaging import build_window_np


def _force(v):
    return float(jnp.sum(v.astype(jnp.float32)))


def _time(fn, x, chain=(8, 24), n=3, chainable=False):
    out = fn(x)
    _force(out)

    def run(k):
        t0 = time.perf_counter()
        if chainable:
            v = x
            for _ in range(k):
                v = fn(v)
            _force(v)
        else:
            for _ in range(k):
                out = fn(x)
            _force(out)
        return time.perf_counter() - t0

    k1, k2 = chain
    t1 = min(run(k1) for _ in range(n))
    t2 = min(run(k2) for _ in range(n))
    return (t2 - t1) / (k2 - k1)


peacock = np.asarray(Image.open("tests/data/peacock_defocus.png")
                     ).astype(np.float32) / 255.0
h, w = 3000, 4000
mp = h * w / 1e6
reps = (h // peacock.shape[0] + 1, w // peacock.shape[1] + 1, 1)
big = np.tile(peacock, reps)[:h, :w].transpose(2, 0, 1)[None]

grid = plan_patch_grid(h, w, 576, 64.0 / 576.0)
th, tw = 6, 8
sh = sw = 512
ph = pw = 576
grid_info = (th, tw, sh, sw, ph, pw)
pt_, pb_, pl_, pr_ = grid.pad
hc, wc = pf.dma_canvas_size(grid_info)
H, W = grid.padded_size
padded = jax.device_put(jnp.pad(
    jnp.asarray(big), ((0, 0), (0, 0), (pt_, pb_ + max(0, hc - H)),
                       (pl_, pr_ + max(0, wc - W))),
    mode="edge").astype(jnp.bfloat16))
tiles = jax.device_put(
    extract_patches(jnp.asarray(big), grid).astype(jnp.bfloat16))
coeffs = _mega_pack(0.362, 0.468, 6.0, 1.0, 2.0, 0.8)

kw = dict(n_iter=3, c=0.362, b=0.468, alpha=6.0, beta=1.0,
          method="direct_separable")

fE2 = jax.jit(functools.partial(polyblur_core, **kw))
dt = _time(fE2, tiles, chainable=True)
print(f"E2 tiles kernel:        {dt*1e3:6.2f} ms  {mp/dt:6.0f} MP/s",
      flush=True)

fE1 = jax.jit(lambda v: pf._image_call(v, coeffs, 3, grid_info,
                                       pad_lanes=True))
dt = _time(fE1, padded)
print(f"E1 dma kernel:          {dt*1e3:6.2f} ms  {mp/dt:6.0f} MP/s",
      flush=True)

window_np = build_window_np((ph, pw), "kaiser")
wsum = np.zeros((H, W))
for (i0, j0) in grid.coords:
    wsum[i0:i0 + ph, j0:j0 + pw] += window_np
inv = jnp.asarray(1.0 / (wsum[:th * sh, :tw * sw] + 1e-8), jnp.float32)
fE3 = jax.jit(lambda v: pf._image_call_blended(
    v, coeffs, 3, grid_info, jnp.asarray(window_np), inv,
    out_dtype=jnp.float32))
dt = _time(fE3, padded)
print(f"E3 blended kernel:      {dt*1e3:6.2f} ms  {mp/dt:6.0f} MP/s",
      flush=True)

fE5 = jax.jit(lambda v: pf._fused_call(v.reshape(-1, 3, ph, pw), coeffs, 3,
                                       ablate=("noest", "nodft")))
dt = _time(fE5, tiles)
print(f"E5 tiles copy-only:     {dt*1e3:6.2f} ms", flush=True)

fE4 = jax.jit(lambda v: pf._image_call(v, coeffs, 3, grid_info,
                                       pad_lanes=True,
                                       ablate=("noest", "nodft")))
dt = _time(fE4, padded)
print(f"E4 dma copy-only:       {dt*1e3:6.2f} ms", flush=True)
