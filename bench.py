"""Headline benchmark: MP/s/chip for 3-iteration blind deblurring at 12MP.

BASELINE.json config 4: 12MP image, bf16, tiled with per-tile blur
estimation, 3 Polyblur iterations. Since round 5 the timed region is the
EVERYTHING-ON-DEVICE pipeline (VERDICT r4 next-step #1): one jitted call
takes the f32 12MP image resident on the chip through bf16 cast ->
edge-pad -> the fully-fused blended mega kernel (each Pallas program DMAs
its tile window from the padded canvas, runs all 3 blind iterations
in VMEM, and blends its windowed output block into the f32 canvas using
neighbour strips carried across the sequential programs) -> the restored
f32 image. No host staging, no excluded stages — the same region the
reference times (its full forward, main.py:122-128).

The shipped grid is 448px tiles at step 384 (statically (8, 128)-aligned,
64px seams >= 2x the 25-tap kernel support). It carries MORE tile
redundancy than the 576/512 grid of rounds 3-4 (1.47x vs 1.33x at 12MP)
but FEWER MXU MACs per output pixel (4641 vs 6328 per channel-iteration:
the spectral kernel's y-DFT matmuls scale with tile-height SQUARED while
its x-rDFT is linear in width) — measured 12MP sweep in tools/grid_ab.py,
docs/ROUND5_NOTES.md. The f32->bf16 ingest cast rides the canvas
edge-pad's single HBM pass (work_dtype, ops/pallas/pad_cast.py).
Reference throughput to beat: ~35 MP/s (0.35MP peacock in "about 10ms"
on an unspecified GPU, reference main.py:122-123); target >= 500
MP/s/chip (BASELINE), >= 1100 end-to-end (VERDICT r5 bar).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

REFERENCE_MP_S = 35.0


def make_12mp_image(rng):
    """12MP RGB test image with natural-ish statistics and mild blur."""
    from PIL import Image

    peacock = np.asarray(Image.open("tests/data/peacock_defocus.png"))
    peacock = peacock.astype(np.float32) / 255.0  # (500,700,3)
    h, w = 3000, 4000  # 12MP
    reps = (h // peacock.shape[0] + 1, w // peacock.shape[1] + 1, 1)
    big = np.tile(peacock, reps)[:h, :w]
    big += rng.normal(0.0, 0.005, big.shape).astype(np.float32)
    return np.clip(big, 0.0, 1.0).astype(np.float32).transpose(2, 0, 1)[None]


def bench(fn, x, n_runs=3, chain=(4, 12)):
    """Per-call device time via a two-point chain-length fit.

    On the tunneled TPU backend ``block_until_ready`` returns without
    waiting, so each measurement forces execution with an on-device scalar
    reduction fetched to host. That force costs a large CONSTANT
    round-trip (~40 ms on this relay, independent of the computation):
    timing k sequential dependent calls (output fed back as input) plus
    one force at two chain lengths and taking the slope cancels the
    constant exactly, leaving pure device time per call.
    """
    import jax.numpy as jnp

    def force(v):
        return float(jnp.sum(v.astype(jnp.float32)))

    out = fn(x)
    force(out)  # compile + first run

    def run(k):
        t0 = time.perf_counter()
        v = x
        for _ in range(k):
            v = fn(v)
        force(v)
        return time.perf_counter() - t0

    k1, k2 = chain
    t1 = min(run(k1) for _ in range(n_runs))
    t2 = min(run(k2) for _ in range(n_runs))
    slope = (t2 - t1) / (k2 - k1)
    return slope if slope > 0 else t2 / k2


def main():
    import jax

    # persistent compilation cache: the mega-kernel compile is ~3 min cold,
    # instant warm (works through the remote-compile relay too)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from polyblur_tpu.patches import deblur_patches

    rng = np.random.default_rng(0)
    img = make_12mp_image(rng)
    b, c, h, w = img.shape
    mp = h * w / 1e6

    x = jax.device_put(jnp.asarray(img))

    # The full on-device pipeline in one jitted callable: f32 image in,
    # f32 restored image out, bf16 tile compute inside (the serving
    # configuration). The f32 output feeds back as the next chain input,
    # so the timed region includes every stage end-to-end.
    fn = jax.jit(lambda v: deblur_patches(
        v, patch_size=448, overlap=64.0 / 448.0,
        work_dtype=jnp.bfloat16, n_iter=3, c=0.362, b=0.468,
        alpha=6.0, beta=1.0, method="direct_separable",
        out_dtype=jnp.float32))

    dt = bench(fn, x)
    mps = mp / dt
    print(json.dumps({
        "metric": "MP/s/chip, 3-iter blind deblur @12MP bf16, "
                  "everything-on-device",
        "value": round(mps, 2),
        "unit": "MP/s",
        "vs_baseline": round(mps / REFERENCE_MP_S, 3),
    }))


if __name__ == "__main__":
    main()
