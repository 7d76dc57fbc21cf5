"""Patch-decomposition engine tests."""

import numpy as np
import jax.numpy as jnp

import polyblur_tpu as pt
from polyblur_tpu.patches import (plan_patch_grid, extract_patches,
                                  overlap_add)

from conftest import psnr


def test_grid_plan_matches_reference_arithmetic():
    # deblurring.py:281-298 tile arithmetic
    g = plan_patch_grid(500, 700, patch_size=400, overlap=0.25)
    assert g.patch_size == (400, 400)
    step = 300
    assert g.padded_size == (400 + step, 400 + step)
    assert len(g.coords) == 4


def test_extract_overlap_add_identity():
    """Tiling then windowed overlap-add with no processing reconstructs the
    image (window sums normalize out)."""
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(2, 3, 90, 110)).astype(np.float32))
    g = plan_patch_grid(90, 110, patch_size=32, overlap=0.25)
    tiles = extract_patches(img, g)
    rec = overlap_add(tiles, g, batch=2)
    np.testing.assert_allclose(rec, img, atol=1e-5, rtol=0)


def test_odd_sizes_cropped_even():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(size=(1, 3, 91, 111)).astype(np.float32))
    deb = pt.PolyblurDeblurring(patch_decomposition=True, patch_size=32)
    out = deb(img, n_iter=1)
    assert out.shape == (1, 3, 90, 110)


def test_patch_path_close_to_whole_image_on_uniform_blur():
    from scipy import ndimage
    from polyblur_tpu.ops.gaussian import gaussian_filter_np

    rng = np.random.default_rng(2)
    base = ndimage.gaussian_filter(rng.uniform(size=(128, 128)), 1.0)
    sharp = (base > base.mean()).astype(np.float32)
    k = gaussian_filter_np((1.5, 0.8), 0.5, k_size=np.array([25, 25]))
    blurred = np.clip(ndimage.convolve(sharp, k, mode="wrap"), 0, 1)
    x = jnp.asarray(blurred, jnp.float32)[None, None]

    whole = pt.PolyblurDeblurring()(x, n_iter=2, alpha=6.0, beta=1.0)
    tiled = pt.PolyblurDeblurring(patch_decomposition=True, patch_size=64)(
        x, n_iter=2, alpha=6.0, beta=1.0)
    # not identical (per-tile estimation) but close in restoration quality
    assert abs(psnr(np.asarray(whole[0, 0]), sharp)
               - psnr(np.asarray(tiled[0, 0]), sharp)) < 2.0
