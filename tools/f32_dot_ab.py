"""Quality + speed A/B of the f32 fast-path dot mode on the real chip.

Usage (repo root, TPU): PYTHONPATH=.:$PYTHONPATH python tools/f32_dot_ab.py {compensated|highest}
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

from PIL import Image
from polyblur_tpu.pipeline import polyblur_core
from polyblur_tpu.ops.pallas import sep_poly_fused

mode = sys.argv[1]
sep_poly_fused.set_f32_dot_mode(mode)

peacock = np.asarray(Image.open("tests/data/peacock_defocus.png")).astype(np.float32) / 255.0


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-300))


def _force(v):
    return float(jnp.sum(v.astype(jnp.float32)))


def _time(fn, x, chain=4, n=3):
    out = fn(x)
    _force(out)

    def run(k):
        t0 = time.perf_counter()
        v = x
        for _ in range(k):
            v = fn(v)
        _force(v)
        return time.perf_counter() - t0

    t1 = min(run(chain) for _ in range(n))
    t2 = min(run(3 * chain) for _ in range(n))
    return (t2 - t1) / (2 * chain)


kw = dict(n_iter=3, c=0.362, b=0.468, alpha=6.0, beta=1.0)
x = jnp.asarray(peacock.transpose(2, 0, 1))[None]

f_fft = jax.jit(functools.partial(polyblur_core, method="fft", **kw))
f_sep = jax.jit(functools.partial(polyblur_core, method="direct_separable", **kw))
o_fft = np.asarray(f_fft(x))
o_sep = np.asarray(f_sep(x))
print(f"[{mode}] full-res RGB fft-vs-separable: {psnr(o_fft, o_sep):.1f} dB", flush=True)

# config-1 analog: gray whole image
gray = jnp.asarray(peacock.mean(axis=-1))[None, None]
f1 = jax.jit(functools.partial(polyblur_core, method="direct_separable", **kw))
dt = _time(f1, gray)
print(f"[{mode}] config1 gray: {dt*1e3:.2f} ms  {gray.size/1e6/dt:.0f} MP/s", flush=True)

# config-3 analog: batch of 400^2 RGB f32 (mega tile route)
rng = np.random.default_rng(0)
base = np.tile(peacock.transpose(2, 0, 1)[None], (8, 1, 1, 1))[:, :, :400, :400]
batch = jnp.asarray(base.astype(np.float32))
f3 = jax.jit(functools.partial(polyblur_core, method="direct_separable", **kw))
dt = _time(f3, batch)
print(f"[{mode}] config3 batch: {dt*1e3:.2f} ms  {batch.size/1e6/dt:.0f} MP/s", flush=True)
o3 = np.asarray(f3(batch))
o3f = np.asarray(jax.jit(functools.partial(polyblur_core, method="fft", **kw))(batch))
print(f"[{mode}] mega-route fft-vs-separable (400^2 tiles): {psnr(o3, o3f):.1f} dB", flush=True)
