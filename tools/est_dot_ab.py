"""A/B of compensated bf16x3 ESTIMATION dots in the mega kernel (VERDICT
r4 next-step #6): does lifting the two derivative-operator matmuls (plus
the halo gradient dots) from Mosaic's truncating DEFAULT to the
error-compensated bf16x3 split move the f32 mega-vs-fft agreement toward
the blocked route's ~125 dB figure, and at what rate cost?

Usage (repo root, TPU): python tools/est_dot_ab.py {on|off}
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from PIL import Image
from polyblur_tpu.pipeline import polyblur_core
from polyblur_tpu.ops.pallas import polyblur_fused

mode = sys.argv[1]
polyblur_fused._EST_DOT_COMPENSATED = mode == "on"

peacock = np.asarray(Image.open("tests/data/peacock_defocus.png")
                     ).astype(np.float32) / 255.0


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64)
                   - np.asarray(b, np.float64)) ** 2)
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

# mega tile route on f32 400^2 tiles vs the fft oracle (the 67.6 dB row)
base = np.tile(peacock.transpose(2, 0, 1)[None],
               (8, 1, 1, 1))[:, :, :400, :400]
batch = jnp.asarray(base.astype(np.float32))
f_sep = jax.jit(functools.partial(polyblur_core,
                                  method="direct_separable", **kw))
f_fft = jax.jit(functools.partial(polyblur_core, method="fft", **kw))
o_sep = np.asarray(f_sep(batch))
o_fft = np.asarray(f_fft(batch))
print(f"[est={mode}] mega-vs-fft (8x400^2 f32 tiles): "
      f"{psnr(o_sep, o_fft):.1f} dB", flush=True)
dt = _time(f_sep, batch)
print(f"[est={mode}] mega rate: {dt*1e3:.2f} ms  "
      f"{batch.size/1e6/dt:.0f} MP/s", flush=True)

# halo path (the gox/goy dots): 448^2 whole image with halo masking
x = jnp.asarray(peacock.transpose(2, 0, 1))[None, :, :448, :448]
kwh = dict(kw, remove_halo=True)
oh_sep = np.asarray(jax.jit(functools.partial(
    polyblur_core, method="direct_separable", **kwh))(x))
oh_fft = np.asarray(jax.jit(functools.partial(
    polyblur_core, method="fft", **kwh))(x))
print(f"[est={mode}] mega-vs-fft halo (448^2 f32): "
      f"{psnr(oh_sep, oh_fft):.1f} dB", flush=True)
