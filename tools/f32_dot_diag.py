"""Per-route f32 dot-mode diagnosis: flagship strength + 2048^2 tiled/blocked.

Usage (repo root, TPU): PYTHONPATH=.:$PYTHONPATH python tools/f32_dot_diag.py {compensated|highest}
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

from PIL import Image
from polyblur_tpu.patches import deblur_patches
from polyblur_tpu.pipeline import polyblur_core
from polyblur_tpu.ops.pallas import sep_poly_fused
from polyblur_tpu.utils.profiling import dispatch_log, reset_dispatch_log
from polyblur_tpu.cli.bench_suite import _time

mode = sys.argv[1]
sep_poly_fused.set_f32_dot_mode(mode)

peacock = np.asarray(Image.open("tests/data/peacock_defocus.png")).astype(np.float32) / 255.0
peacock_x = jnp.asarray(peacock.transpose(2, 0, 1))[None]

ref = np.load("tests/data/reference_fixtures.npz")
tgt = np.asarray(ref["e2e_out_fft_fullres"], np.float32)


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-300))


kw = dict(n_iter=3, c=0.362, b=0.468, alpha=6.0, beta=1.0,
          method="direct_separable")

# --- failure 2: flagship strength, f32 448-tile route ---
reset_dispatch_log()
of = deblur_patches(peacock_x, patch_size=448, overlap=1.0 / 7.0, **kw)
print(f"[{mode}] f32 448-tiles dispatch: {dispatch_log()}", flush=True)
print(f"[{mode}] strength psnr(of,tgt) = {psnr(np.asarray(of), tgt):.3f} dB", flush=True)

# --- failure 3: 2048^2 f32 tiled vs blocked ---
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(size=(1, 3, 2048, 2048)).astype(np.float32))
reset_dispatch_log()
f_t = jax.jit(lambda v: deblur_patches(v, patch_size=576, overlap=64.0 / 576.0, **kw))
t_tiled = _time(f_t, x, chain=2)
print(f"[{mode}] 2048^2 f32 tiled: {t_tiled*1e3:.1f} ms  dispatch {dispatch_log()}", flush=True)
f_b = jax.jit(functools.partial(polyblur_core, **kw))
t_block = _time(f_b, x, chain=2)
print(f"[{mode}] 2048^2 f32 blocked: {t_block*1e3:.1f} ms", flush=True)
