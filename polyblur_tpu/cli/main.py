"""Deblurring demo CLI — TPU-native counterpart of /root/reference/main.py.

    python -m polyblur_tpu.cli.main --impath tests/data/peacock_defocus.png \
        --N 3 --alpha 6 --beta 1

Same flag surface as the reference (main.py:30-55), same warm-up-then-timed
protocol (main.py:117-128; jax.jit warm-up replaces torch JIT), plus
``--method`` (the reference hardcodes direct-on-CUDA / fft-on-CPU,
main.py:109-112; on TPU the fast path is ``direct_separable``).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    v = str(v).lower()
    if v in ("yes", "true", "t", "y", "1"):
        return True
    if v in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Polyblur blind deblurring (TPU)")
    p.add_argument("--impath", type=str, required=True, help="input image")
    p.add_argument("--synthetic_degradation", type=str2bool, default=False,
                   help="if set adds synthetic gaussian blur")
    p.add_argument("--sigma", type=float, default=3.0)
    p.add_argument("--rho", type=float, default=1.0)
    p.add_argument("--theta", type=float, default=0.0,
                   help="kernel angle in degrees")
    p.add_argument("--sigma_n", type=float, default=0.01, help="noise std")
    p.add_argument("--N", type=int, default=3, help="polyblur iterations")
    p.add_argument("--alpha", type=float, default=2)
    p.add_argument("--beta", type=float, default=3)
    p.add_argument("--q", type=float, default=0)
    p.add_argument("--do_prefiltering", type=str2bool, default=False)
    p.add_argument("--do_halo_removal", type=str2bool, default=False)
    p.add_argument("--do_edgetaping", type=str2bool, default=False)
    p.add_argument("--do_patch_decomposition", type=str2bool, default=False)
    p.add_argument("--patch_size", type=int, default=400)
    p.add_argument("--patch_overlap", type=float, default=0.25)
    p.add_argument("--method", type=str, default="auto",
                   choices=["auto", "fft", "direct", "direct_separable"],
                   help="auto = direct_separable on TPU, fft elsewhere "
                        "(the reference's direct-on-CUDA / fft-on-CPU "
                        "selection, main.py:109-112)")
    p.add_argument("--outdir", type=str, default="results")
    p.add_argument("--show", type=str2bool, default=False,
                   help="display with matplotlib")
    return p


def main(argv=None) -> str:
    args = build_parser().parse_args(argv)

    from ..api import PolyblurDeblurring
    from ..ops.gaussian import gaussian_filter_np
    from ..utils.io import imread_float, imsave_uint8

    print("Polyblur (TPU) runs with parameters:")
    for k in ("synthetic_degradation", "N", "alpha", "beta", "method",
              "do_prefiltering", "do_edgetaping", "do_halo_removal",
              "do_patch_decomposition"):
        print(f"  {k}: {getattr(args, k)}")

    img = imread_float(args.impath)
    print(f"Processing a ({img.shape[1]},{img.shape[0]}) image.")

    if args.synthetic_degradation:
        from scipy import ndimage

        kernel = gaussian_filter_np(
            (args.sigma, args.rho), theta=args.theta * np.pi / 180.0,
            k_size=np.array([25, 25]))
        if img.ndim == 2:
            imblur = ndimage.convolve(img, kernel, mode="wrap")
        else:
            imblur = ndimage.convolve(img, kernel[..., None], mode="wrap")
        imblur = imblur + args.sigma_n * np.random.randn(*imblur.shape)
        imblur = np.clip(imblur, 0.0, 1.0).astype(np.float32)
    else:
        imblur = img

    deblurrer = PolyblurDeblurring(
        patch_decomposition=args.do_patch_decomposition,
        patch_size=args.patch_size, patch_overlap=args.patch_overlap,
        batch_size=20)
    method = args.method
    if method == "auto":
        import jax

        method = ("direct_separable" if jax.default_backend() == "tpu"
                  else "fft")
        print(f"method=auto -> {method} ({jax.default_backend()})")
    kw = dict(n_iter=args.N, c=0.362, b=0.468, alpha=args.alpha,
              beta=args.beta, remove_halo=args.do_halo_removal,
              prefiltering=args.do_prefiltering,
              edgetaping=args.do_edgetaping, method=method, q=args.q)

    print("Warm-up run (compiles the XLA program — may take a while).")
    impred = deblurrer(imblur, **kw)
    print("Timed run:")
    start = time.time()
    impred = np.asarray(deblurrer(imblur, **kw))
    print(f"Restoration took {time.time() - start:.3f} seconds")

    os.makedirs(args.outdir, exist_ok=True)
    out_path = os.path.join(
        args.outdir, f"restored_alpha_{args.alpha:g}_beta_{args.beta:g}.png")
    imsave_uint8(out_path, impred)
    print(f"saved {out_path}")

    if args.show:
        import matplotlib.pyplot as plt

        _, axes = plt.subplots(1, 2, figsize=(6, 4))
        axes[0].imshow(imblur, cmap="gray")
        axes[0].set_title("Blurry")
        axes[1].imshow(impred, cmap="gray")
        axes[1].set_title("Prediction")
        for ax in axes:
            ax.axis("off")
        plt.tight_layout()
        plt.show()
    print("done")
    return out_path


if __name__ == "__main__":
    main()
