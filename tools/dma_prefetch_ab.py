"""A/B timing of the image-DMA mega kernel (12MP, 576/512 + 400/300).

Usage (repo root, TPU): PYTHONPATH=.:$PYTHONPATH python tools/dma_prefetch_ab.py
(run once at HEAD, once with the prefetch commit stashed/reverted)
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache_ab")

from polyblur_tpu.patches import plan_patch_grid, _grid_steps
from polyblur_tpu.pipeline import mega_restore_padded
from PIL import Image

peacock = np.asarray(Image.open("tests/data/peacock_defocus.png")).astype(np.float32) / 255.0
h, w = 3000, 4000
reps = (h // peacock.shape[0] + 1, w // peacock.shape[1] + 1, 1)
big = np.tile(peacock, reps)[:h, :w].transpose(2, 0, 1)[None]


def _force(v):
    return float(jnp.sum(v.astype(jnp.float32)))


def _time(fn, x, chain=4, n=3):
    out = fn(x)
    _force(out)

    def run(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = fn(x)
        _force(o)
        return time.perf_counter() - t0

    k1, k2 = chain, 3 * chain
    t1 = min(run(k1) for _ in range(n))
    t2 = min(run(k2) for _ in range(n))
    return (t2 - t1) / (k2 - k1)


for ps, ov, tag in ((576, 64.0 / 576.0, "576/512"), (400, 0.25, "400/300")):
    grid = plan_patch_grid(h, w, ps, ov)
    th, tw, sh, sw = _grid_steps(grid)
    ph, pw = grid.patch_size
    grid_info = (th, tw, sh, sw, ph, pw)
    pt, pb, pl_, pr = grid.pad
    canvas = jnp.pad(jnp.asarray(big), ((0, 0), (0, 0), (pt, pb), (pl_, pr)),
                     mode="edge").astype(jnp.bfloat16)
    canvas = jax.device_put(canvas)
    f = jax.jit(functools.partial(
        mega_restore_padded, grid_info=grid_info, n_iter=3, c=0.362, b=0.468,
        alpha=6.0, beta=1.0, method="direct_separable"))
    dt = _time(f, canvas)
    print(f"{tag}: {dt*1e3:.2f} ms  {h*w/1e6/dt:.0f} MP/s", flush=True)
