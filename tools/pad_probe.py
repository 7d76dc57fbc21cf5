"""Time the end-to-end route's XLA prologue variants at 12MP: the bf16
cast + centered edge-pad that feeds the blended mega kernel (VERDICT r4
row C: 0.72 ms, ~310 GB/s vs ~800 GB/s HBM SoL for its 224 MB).

Rows:
  P1 cast only                      (contiguous, lower bound)
  P2 cast + rows-only centered pad  (no lane shift)
  P3 cast + full centered pad       [the shipped prologue]
  P4 cast + full pad, all bottom/right (alignment probe: content at
     lane 0 — measures how much of P3 is the lane-shift relayout)
  P5 pad f32 first, then cast       (op-order probe)

Usage (repo root, TPU): python tools/pad_probe.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

h, w = 3000, 4000
pt, pb, pl, pr = 68, 196, 80, 208  # the 576/512 blended-route pad at 12MP
rng = np.random.default_rng(0)
x = jax.device_put(jnp.asarray(
    rng.uniform(size=(1, 3, h, w)).astype(np.float32)))


def _force(v):
    return float(jnp.sum(v.astype(jnp.float32)))


def _time(fn, x, chain=(8, 24), n=3):
    out = fn(x)
    _force(out)

    def run(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = fn(x)
        _force(o)
        return time.perf_counter() - t0

    k1, k2 = chain
    t1 = min(run(k1) for _ in range(n))
    t2 = min(run(k2) for _ in range(n))
    return (t2 - t1) / (k2 - k1)


ROWS = [
    ("P1 cast only", lambda v: v.astype(jnp.bfloat16)),
    ("P2 cast + row pad", lambda v: jnp.pad(
        v.astype(jnp.bfloat16), ((0, 0), (0, 0), (pt, pb), (0, 0)),
        mode="edge")),
    ("P3 cast + centered pad", lambda v: jnp.pad(
        v.astype(jnp.bfloat16), ((0, 0), (0, 0), (pt, pb), (pl, pr)),
        mode="edge")),
    ("P4 cast + bottom/right pad", lambda v: jnp.pad(
        v.astype(jnp.bfloat16), ((0, 0), (0, 0), (0, pt + pb), (0, pl + pr)),
        mode="edge")),
    ("P5 pad f32 then cast", lambda v: jnp.pad(
        v, ((0, 0), (0, 0), (pt, pb), (pl, pr)),
        mode="edge").astype(jnp.bfloat16)),
]

for name, fn in ROWS:
    f = jax.jit(fn)
    dt = _time(f, x)
    out = f(x)
    gb = (x.nbytes + out.size * out.dtype.itemsize) / 1e9
    print(f"{name:30s} {dt * 1e3:6.3f} ms  {gb / dt:6.0f} GB/s", flush=True)
