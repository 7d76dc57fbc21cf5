"""Same-session A/B of the 12MP everything-on-device decomposition
(VERDICT r4 next-step #1): kernel-only vs DMA+fused-OA vs blended-mega
routes, plus the cast+pad prologue alone.

Usage (repo root, TPU): python tools/blend_ab.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from PIL import Image

from polyblur_tpu.pipeline import polyblur_core
from polyblur_tpu.patches import plan_patch_grid, extract_patches, \
    deblur_patches


def _force(v):
    return float(jnp.sum(v.astype(jnp.float32)))


def _time(fn, x, chain=(4, 12), n=3):
    out = fn(x)
    _force(out)

    def run(k):
        t0 = time.perf_counter()
        v = x
        for _ in range(k):
            v = fn(v)
        _force(v)
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
rng = np.random.default_rng(0)
big = np.tile(peacock, reps)[:h, :w]
big += rng.normal(0.0, 0.005, big.shape).astype(np.float32)
big = np.clip(big, 0, 1).astype(np.float32).transpose(2, 0, 1)[None]
x = jax.device_put(jnp.asarray(big))

kw = dict(n_iter=3, c=0.362, b=0.468, alpha=6.0, beta=1.0,
          method="direct_separable")

# A. kernel-only on pre-extracted bf16 tiles (the old headline)
grid = plan_patch_grid(h, w, 576, 64.0 / 576.0)
tiles = jax.device_put(
    extract_patches(jnp.asarray(big), grid).astype(jnp.bfloat16))
fA = jax.jit(functools.partial(polyblur_core, **kw))
dt = _time(fA, tiles, chain=(8, 24))
print(f"A kernel-only tiles:   {dt*1e3:6.2f} ms  {mp/dt:6.0f} MP/s",
      flush=True)

# B. everything-on-device via the blended route (the new headline)
fB = jax.jit(lambda v: deblur_patches(
    v.astype(jnp.bfloat16), patch_size=576, overlap=64.0 / 576.0,
    out_dtype=jnp.float32, **kw))
dt = _time(fB, x)
print(f"B blended e2e:         {dt*1e3:6.2f} ms  {mp/dt:6.0f} MP/s",
      flush=True)

# C. everything-on-device via DMA tiles + fused overlap-add (round-4 4b2)
fC = jax.jit(lambda v: deblur_patches(
    v.astype(jnp.bfloat16), patch_size=576, overlap=64.0 / 576.0,
    out_dtype=jnp.float32, _disable_blended=True, **kw))
dt = _time(fC, x)
print(f"C dma+fusedOA e2e:     {dt*1e3:6.2f} ms  {mp/dt:6.0f} MP/s",
      flush=True)

# D. the cast+pad prologue alone (row C of the round-4 breakdown)
pt_, pb_, pl_, pr_ = grid.pad
fD = jax.jit(lambda v: jnp.pad(
    v.astype(jnp.bfloat16)[..., :grid.orig_size[0], :grid.orig_size[1]],
    ((0, 0), (0, 0), (pt_, pb_ + 0), (pl_, pr_ + 64)),
    mode="edge").astype(jnp.float32)[..., :h, :w])
dt = _time(fD, x)
print(f"D cast+pad (f32 back): {dt*1e3:6.2f} ms", flush=True)
