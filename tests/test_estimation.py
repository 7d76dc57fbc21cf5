"""Blur-estimation parity: stage-by-stage against the torch reference
fixtures, oracle cross-checks, and synthetic round-trip accuracy."""

import numpy as np
import jax.numpy as jnp

from polyblur_tpu.estimation import (gaussian_blur_estimation,
                                     compute_gradient_magnitudes,
                                     find_maximal_blur_direction,
                                     compute_gaussian_parameters,
                                     cubic_interpolator,
                                     normalize_quantiles)
from polyblur_tpu.ops.fourier import fourier_gradients
from polyblur_tpu.ops.gaussian import gaussian_filter_np
from polyblur_tpu.oracle import numpy_ref as oracle


def _peacock_gray_norm(peacock):
    x = jnp.asarray(peacock.transpose(2, 0, 1))[None]
    g = jnp.mean(x, axis=1, keepdims=True)
    return normalize_quantiles(g, q=0.0)


def test_stagewise_vs_reference(ref, peacock):
    g = _peacock_gray_norm(peacock)
    gx, gy = fourier_gradients(g)
    mags = compute_gradient_magnitudes(gx, gy, n_angles=6)
    np.testing.assert_allclose(mags, ref["est_mags"], atol=1e-4, rtol=0)

    thetas = jnp.floor(jnp.linspace(0.0, 180.0, 7))[None]
    ith = jnp.floor(jnp.arange(0.0, 180.0, 6.0))[None]
    mn, mo, tn = find_maximal_blur_direction(mags, thetas, ith)
    np.testing.assert_allclose(mn, ref["est_mn"], atol=1e-4, rtol=0)
    np.testing.assert_allclose(mo, ref["est_mo"], atol=1e-4, rtol=0)
    np.testing.assert_allclose(tn, ref["est_theta"], atol=1e-6, rtol=0)

    sg, rh = compute_gaussian_parameters(mn, mo, c=0.362, b=0.468)
    np.testing.assert_allclose(sg, ref["est_sigma"], atol=1e-4, rtol=0)
    np.testing.assert_allclose(rh, ref["est_rho"], atol=1e-4, rtol=0)


def test_kernel_vs_reference(ref, peacock):
    x = jnp.asarray(peacock.transpose(2, 0, 1))[None]
    k = gaussian_blur_estimation(x, c=0.362, b=0.468, q=0.0, ker_size=25)
    assert k.shape == (1, 1, 25, 25)
    np.testing.assert_allclose(k, ref["est_kernel_peacock"], atol=1e-4, rtol=0)


def test_matches_oracle_chain(peacock):
    gray = peacock.mean(axis=-1)
    sg_o, rh_o, th_o = oracle.estimate_gaussian_parameters(gray)
    x = jnp.asarray(gray, jnp.float32)[None, None]
    sg, rh, th = gaussian_blur_estimation(x, c=0.362, b=0.468, q=0.0,
                                          return_2d_filters=False)
    assert abs(float(sg[0, 0]) - sg_o) < 1e-3
    assert abs(float(rh[0, 0]) - rh_o) < 1e-3
    assert abs(float(th[0, 0]) - th_o) < 1e-6


def test_cubic_interpolator_matches_oracle():
    rng = np.random.default_rng(0)
    x = np.floor(np.linspace(0, 180, 7)) / 30.0
    xn = np.floor(np.arange(0, 180, 6.0)) / 30.0
    y = rng.uniform(1.0, 3.0, size=(4, 7))
    out = cubic_interpolator(jnp.asarray(xn)[None], jnp.asarray(x)[None],
                             jnp.asarray(y))
    ref_out = oracle.keys_cubic_interp(xn, x, y)
    np.testing.assert_allclose(out, ref_out, atol=1e-6, rtol=0)


def test_synthetic_roundtrip_recovers_parameters():
    """Blur a sharp natural-statistics image with a known anisotropic
    Gaussian; the estimator must recover (sigma, rho, theta) approximately
    (the reference's implicit validation protocol, SURVEY.md §4)."""
    from scipy import ndimage

    rng = np.random.default_rng(7)
    # structured image: random step edges at many orientations
    base = rng.uniform(size=(200, 200))
    sharp = (ndimage.gaussian_filter(base, 1.0) > 0.5).astype(np.float32)
    sigma_gt, rho_gt, theta_gt = 2.2, 0.8, np.deg2rad(48)
    k = gaussian_filter_np((sigma_gt, rho_gt), theta_gt,
                           k_size=np.array([25, 25]))
    blurred = ndimage.convolve(sharp, k, mode="wrap").astype(np.float32)
    x = jnp.asarray(blurred)[None, None]
    sg, rh, th = gaussian_blur_estimation(x, c=0.362, b=0.468, q=0.0,
                                          return_2d_filters=False)
    assert abs(float(sg[0, 0]) - sigma_gt) < 0.6
    assert abs(float(rh[0, 0]) - rho_gt) < 0.45
    # angle modulo pi
    derr = abs(float(th[0, 0]) - theta_gt) % np.pi
    assert min(derr, np.pi - derr) < np.deg2rad(10)


def test_multichannel_shapes():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=(2, 3, 40, 40)).astype(np.float32))
    k = gaussian_blur_estimation(x, multichannel=True)
    # C == 3 collapses to gray in the reference (blur_estimation.py:36-37)
    assert k.shape == (2, 1, 25, 25)
    x4 = jnp.asarray(rng.uniform(size=(2, 4, 40, 40)).astype(np.float32))
    k4 = gaussian_blur_estimation(x4, multichannel=True)
    assert k4.shape == (2, 4, 25, 25)
    sums = np.asarray(jnp.sum(k4, axis=(-2, -1)))
    np.testing.assert_allclose(sums, 1.0, atol=1e-5)


def test_estimates_bitwise_stable():
    """BASELINE.md stability gate: repeated runs give identical estimates."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(size=(1, 1, 64, 64)).astype(np.float32))
    a = gaussian_blur_estimation(x, return_2d_filters=False)
    b = gaussian_blur_estimation(x, return_2d_filters=False)
    for u, v in zip(a, b):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


def test_quantile_normalization_matches_reference(ref, peacock):
    x = jnp.asarray(peacock.transpose(2, 0, 1))[None]
    k = gaussian_blur_estimation(x, c=0.362, b=0.468, q=1e-4, ker_size=25)
    np.testing.assert_allclose(k, ref["est_kernel_q"], atol=1e-4, rtol=0)


def test_saturation_mask_matches_reference(ref):
    x = jnp.asarray(ref["est_in_sat"])
    k = gaussian_blur_estimation(x, c=0.362, b=0.468, q=0.0, ker_size=25,
                                 discard_saturation=True)
    np.testing.assert_allclose(k, ref["est_kernel_sat"], atol=1e-4, rtol=0)
