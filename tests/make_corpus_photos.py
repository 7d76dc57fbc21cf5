"""Generate the committed high-resolution quality corpus (tests/data/corpus_hr).

The reference validates quality on DIV2K 2K-resolution photographs
(/root/reference/calibrate_blur_parameters.py:206-214, README.md:100-101).
DIV2K is not available in this offline environment, and only FOUR real
photographs ship with the baked packages (the reference's peacock, sklearn's
china/flower, matplotlib's grace_hopper). This script builds a DOCUMENTED
PROCEDURAL STAND-IN (VERDICT r4 next-step #3) — a 12-image corpus of
~2MP images spanning the statistics the estimation chain and the parity
gates care about:

* ``mosaic_*`` (4): multi-scale collages of random crops from the real
  photographs — real edges, textures, bokeh, and color statistics at
  DIV2K-like resolution (the crops are rescaled 0.5-2.5x, so the corpus
  spans sharpness levels the way a photo collection does).
* ``deadleaves_*`` (4): the dead-leaves occlusion model — disks with a
  1/r^3 radius law and colors sampled from the real photos' pixel
  distributions, rendered at 2x and box-downsampled. Dead leaves is the
  standard procedural model of natural-image statistics (scale-invariant
  power spectrum, occlusion edges at all orientations/contrasts) used by
  the camera-IQ community precisely as a stand-in for natural content.
* ``spectrum_*`` (2): Gaussian random fields with a 1/f^alpha amplitude
  spectrum (alpha 1.0/1.3 bracketing natural images' ~1.1), plus a
  piecewise-constant Voronoi layer for edge content.
* ``lowlight_mosaic`` / ``hicontrast_leaves`` (2): gamma-darkened and
  contrast-stretched variants — the normalize() path sees realistic
  dynamic-range extremes.

Everything is seeded; re-running reproduces the committed PNGs bit-exactly
(PIL PNG encoding is deterministic). The corpus feeds three gate families
(VERDICT r4 #3): the 0.05 dB fast-vs-fft strength parity gate and the bf16
strength gate (tests/test_pipeline.py::test_hr_corpus_*) and the (c, b)
calibration pin across all 12 images (tests/test_runtime.py).
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                   "corpus_hr")

H, W = 1200, 1600  # ~2MP, DIV2K-like aspect


def _real_photos():
    """The four real photographs available offline, as float32 (H, W, 3)."""
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
    imgs = {}
    imgs["peacock"] = np.asarray(
        Image.open(os.path.join(here, "peacock_defocus.png"))).astype(
            np.float32) / 255.0
    for name in ("china", "flower", "grace_hopper"):
        imgs[name] = np.asarray(
            Image.open(os.path.join(here, "calib", f"{name}.jpg"))).astype(
                np.float32) / 255.0
    return imgs


def mosaic(photos, rng, cells_y=4, cells_x=4, gamma=None):
    """Multi-scale collage: each grid cell gets a random crop of a random
    photo, resized (bicubic, 0.5-2.5x zoom) to the cell."""
    canvas = np.zeros((H, W, 3), np.float32)
    ys = np.linspace(0, H, cells_y + 1).astype(int)
    xs = np.linspace(0, W, cells_x + 1).astype(int)
    names = sorted(photos)
    for i in range(cells_y):
        for j in range(cells_x):
            ch, cw = ys[i + 1] - ys[i], xs[j + 1] - xs[j]
            src = photos[names[rng.integers(len(names))]]
            zoom = rng.uniform(0.5, 2.5)
            sh = min(src.shape[0], max(16, int(round(ch / zoom))))
            sw = min(src.shape[1], max(16, int(round(cw / zoom))))
            y0 = rng.integers(0, src.shape[0] - sh + 1)
            x0 = rng.integers(0, src.shape[1] - sw + 1)
            crop = src[y0:y0 + sh, x0:x0 + sw]
            im = Image.fromarray((crop * 255).astype(np.uint8))
            im = im.resize((cw, ch), Image.BICUBIC)
            canvas[ys[i]:ys[i + 1], xs[j]:xs[j + 1]] = (
                np.asarray(im).astype(np.float32) / 255.0)
    if gamma is not None:
        canvas = canvas ** gamma
    return np.clip(canvas, 0.0, 1.0)


def dead_leaves(palette_img, rng, rmin=6.0, rmax=180.0, n_disks=30000,
                ss=2, gray=False, contrast=None):
    """Front-to-back dead-leaves render at ``ss``x supersampling.

    Radius law p(r) ~ 1/r^3 on [rmin, rmax] (the scale-invariant choice);
    disk colors are sampled pixels of a real photograph, so the corpus
    keeps natural color statistics.
    """
    Hs, Ws = H * ss, W * ss
    img = np.zeros((Hs, Ws, 3), np.float32)
    filled = np.zeros((Hs, Ws), bool)
    flat = palette_img.reshape(-1, 3)
    yy = np.arange(Hs, dtype=np.float32)
    xx = np.arange(Ws, dtype=np.float32)
    inv_min2, inv_max2 = 1.0 / rmin ** 2, 1.0 / rmax ** 2
    for _ in range(n_disks):
        u = rng.uniform()
        r = ss / np.sqrt(inv_min2 - u * (inv_min2 - inv_max2))
        cy = rng.uniform(0, Hs)
        cx = rng.uniform(0, Ws)
        color = flat[rng.integers(len(flat))]
        y0, y1 = max(0, int(cy - r)), min(Hs, int(cy + r) + 2)
        x0, x1 = max(0, int(cx - r)), min(Ws, int(cx + r) + 2)
        if y0 >= y1 or x0 >= x1:
            continue
        dy = (yy[y0:y1] - cy)[:, None]
        dx = (xx[x0:x1] - cx)[None, :]
        disk = (dy * dy + dx * dx) <= r * r
        new = disk & ~filled[y0:y1, x0:x1]
        img[y0:y1, x0:x1][new] = color
        filled[y0:y1, x0:x1] |= disk
        if filled.mean() > 0.999:
            break
    # fill any remaining background with the palette mean
    img[~filled] = flat.mean(axis=0)
    # box-downsample the supersampled render
    img = img.reshape(H, ss, W, ss, 3).mean(axis=(1, 3))
    if gray:
        img = np.repeat(img.mean(axis=-1, keepdims=True), 3, axis=-1)
    if contrast is not None:
        img = 0.5 + contrast * (img - 0.5)
    return np.clip(img, 0.0, 1.0)


def spectrum_field(rng, alpha=1.0):
    """Gaussian random field with a 1/f^alpha amplitude spectrum plus a
    piecewise-constant Voronoi layer (edge content at all orientations)."""
    fy = np.fft.fftfreq(H)[:, None]
    fx = np.fft.rfftfreq(W)[None, :]
    f = np.sqrt(fy * fy + fx * fx)
    f[0, 0] = 1.0
    amp = 1.0 / f ** alpha
    chans = []
    for _ in range(3):
        phase = rng.uniform(0, 2 * np.pi, amp.shape)
        spec = amp * np.exp(1j * phase)
        x = np.fft.irfft2(spec, s=(H, W))
        x = (x - x.min()) / (x.max() - x.min() + 1e-12)
        chans.append(x)
    field = np.stack(chans, axis=-1).astype(np.float32)
    # Voronoi flats: nearest of k seeds, each a constant color
    k = 40
    sy = rng.uniform(0, H, k)
    sx = rng.uniform(0, W, k)
    cols = rng.uniform(0.05, 0.95, (k, 3)).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    d = (yy[..., None] - sy) ** 2 + (xx[..., None] - sx) ** 2
    vor = cols[np.argmin(d, axis=-1)]
    out = 0.55 * field + 0.45 * vor
    return np.clip(out, 0.0, 1.0)


def build_corpus():
    photos = _real_photos()
    imgs = {}
    imgs["mosaic_fine"] = mosaic(photos, np.random.default_rng(101), 6, 8)
    imgs["mosaic_coarse"] = mosaic(photos, np.random.default_rng(102), 2, 3)
    imgs["mosaic_mixed"] = mosaic(photos, np.random.default_rng(103), 4, 5)
    imgs["mosaic_wide"] = mosaic(photos, np.random.default_rng(104), 3, 6)
    imgs["lowlight_mosaic"] = mosaic(photos, np.random.default_rng(105),
                                     4, 4, gamma=2.2)
    pal = np.concatenate([p.reshape(-1, 3)[::7] for p in photos.values()])
    pal_img = pal.reshape(-1, 1, 3)[: (len(pal) // 1) // 1]
    rngs = [np.random.default_rng(s) for s in (201, 202, 203, 204)]
    imgs["deadleaves_fine"] = dead_leaves(pal_img, rngs[0], rmin=3.0,
                                          rmax=60.0, n_disks=120000)
    imgs["deadleaves_coarse"] = dead_leaves(pal_img, rngs[1], rmin=15.0,
                                            rmax=400.0, n_disks=8000)
    imgs["deadleaves_gray"] = dead_leaves(pal_img, rngs[2], gray=True)
    imgs["hicontrast_leaves"] = dead_leaves(pal_img, rngs[3], contrast=1.6)
    imgs["spectrum_1f"] = spectrum_field(np.random.default_rng(301), 1.0)
    imgs["spectrum_13f"] = spectrum_field(np.random.default_rng(302), 1.3)
    # the full-res peacock itself, tiled up to corpus resolution (the only
    # real photo at native 0.35MP; tiling keeps it a pure-photo member)
    pk = photos["peacock"]
    reps = (H // pk.shape[0] + 1, W // pk.shape[1] + 1, 1)
    imgs["peacock_tiled"] = np.tile(pk, reps)[:H, :W]
    return imgs


def main():
    os.makedirs(OUT, exist_ok=True)
    imgs = build_corpus()
    for name, arr in sorted(imgs.items()):
        assert arr.shape == (H, W, 3) and arr.dtype == np.float32
        path = os.path.join(OUT, f"{name}.png")
        Image.fromarray((np.clip(arr, 0, 1) * 255).round().astype(
            np.uint8)).save(path, optimize=True)
        print(f"wrote {path} ({os.path.getsize(path) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
