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

    from ..pipeline import polyblur_core
    from ..runtime.loader import BurstLoader
    from ..runtime import native
    from ..utils.imaging import build_window
    from ..utils.io import imsave_uint8

    paths = sorted(glob.glob(args.images))
    if not paths:
        raise SystemExit(f"no images match {args.images!r}")
    os.makedirs(args.outdir, exist_ok=True)
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    fn = jax.jit(functools.partial(
        polyblur_core, n_iter=args.N, c=args.c, b=args.b, alpha=args.alpha,
        beta=args.beta, method="direct_separable"))

    loader = BurstLoader(paths, patch_size=args.patch_size,
                         overlap=args.overlap, prefetch=args.prefetch)
    window = None
    total_mp = 0.0
    t_start = time.perf_counter()
    n_done = 0
    for tiles, grid, meta in loader:
        dev_tiles = jax.device_put(jnp.asarray(tiles).astype(dt))
        restored = fn(dev_tiles)
        restored_np = np.asarray(restored.astype(jnp.float32))
        if window is None or window.shape != grid.patch_size:
            window = np.asarray(build_window(grid.patch_size, "kaiser"))
        out = native.overlap_add_host(restored_np, grid, 1, window)
        name = os.path.splitext(os.path.basename(meta["path"]))[0]
        out_path = os.path.join(args.outdir, f"{name}_restored.png")
        imsave_uint8(out_path, np.transpose(out[0], (1, 2, 0)).squeeze())
        _, _, h, w = meta["shape"]
        total_mp += h * w / 1e6
        n_done += 1
        print(f"[{n_done}/{len(paths)}] {meta['path']} "
              f"({h}x{w}) -> {out_path}")
    dt_total = time.perf_counter() - t_start
    print(f"burst done: {n_done} images, {total_mp:.1f} MP in "
          f"{dt_total:.2f}s = {total_mp / dt_total:.1f} MP/s "
          f"(incl. first-compile and host I/O)")
    return n_done


if __name__ == "__main__":
    main()
