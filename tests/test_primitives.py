"""Stage-level parity of the L1 primitives against the torch reference
(golden fixtures) and the NumPy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from polyblur_tpu.ops.fourier import fourier_gradients, p2o, fft_convolve2d
from polyblur_tpu.ops.gaussian import (batch_gaussian_kernels,
                                       gaussian_filter_np, dirac)
from polyblur_tpu.ops.conv import conv2d_grouped, convolve2d
from polyblur_tpu.utils.imaging import (pad_with_kernel, crop_with_kernel,
                                        to_tensor, to_array, build_window)
from polyblur_tpu.oracle import numpy_ref as oracle


def test_fourier_gradients_matches_reference(ref):
    gx, gy = fourier_gradients(jnp.asarray(ref["grad_in"]))
    np.testing.assert_allclose(gx, ref["grad_x"], atol=2e-5, rtol=0)
    np.testing.assert_allclose(gy, ref["grad_y"], atol=2e-5, rtol=0)


def test_fourier_gradients_matches_oracle():
    rng = np.random.default_rng(3)
    img = rng.uniform(size=(32, 48))
    gx_o, gy_o = oracle.fourier_gradients(img)
    gx, gy = fourier_gradients(jnp.asarray(img, jnp.float32))
    np.testing.assert_allclose(gx, gx_o, atol=5e-6, rtol=0)
    np.testing.assert_allclose(gy, gy_o, atol=5e-6, rtol=0)


def test_p2o_matches_reference(ref):
    K = p2o(jnp.asarray(ref["p2o_kernel"]), (40, 56))
    np.testing.assert_allclose(K.real, ref["p2o_real"], atol=1e-6, rtol=0)
    np.testing.assert_allclose(K.imag, ref["p2o_imag"], atol=1e-6, rtol=0)


def test_gaussian_kernel_batch_matches_numpy_builder():
    # batched inverse-covariance builder vs the NumPy synthesis kernel
    sigmas = np.array([[2.0], [1.3]], np.float32)
    rhos = np.array([[0.7], [1.3]], np.float32)
    thetas = np.array([[0.5], [0.0]], np.float32)
    ks = batch_gaussian_kernels(jnp.asarray(thetas), jnp.asarray(sigmas),
                                jnp.asarray(rhos), 25)
    for i in range(2):
        ref_k = gaussian_filter_np((sigmas[i, 0], rhos[i, 0]), thetas[i, 0],
                                   k_size=np.array([25, 25]))
        np.testing.assert_allclose(ks[i, 0], ref_k, atol=1e-6, rtol=0)


def test_dirac_conv_identity():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(1, 3, 31, 33)).astype(np.float32))
    k = jnp.asarray(dirac((25, 25)))[None, None]
    out = conv2d_grouped(img, k)
    np.testing.assert_allclose(out, img, atol=1e-6)
    out_fft = fft_convolve2d(img, k)
    np.testing.assert_allclose(out_fft, img, atol=1e-5)


def test_direct_vs_fft_convolution_interior():
    # away from boundaries the two backends must agree
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(size=(2, 3, 48, 48)).astype(np.float32))
    k = batch_gaussian_kernels(
        jnp.asarray([[0.3], [1.2]]), jnp.asarray([[2.0], [1.0]]),
        jnp.asarray([[0.8], [0.5]]), 13).astype(jnp.float32)
    a = convolve2d(img, k, method="direct")
    b = convolve2d(img, k, method="fft")
    np.testing.assert_allclose(a[..., 8:-8, 8:-8], b[..., 8:-8, 8:-8],
                               atol=1e-5, rtol=0)


def test_pad_crop_roundtrip():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(size=(1, 1, 10, 12)).astype(np.float32))
    padded = pad_with_kernel(img, ksize=25)
    assert padded.shape == (1, 1, 34, 36)
    np.testing.assert_array_equal(crop_with_kernel(padded, ksize=25), img)
    # replicate semantics
    np.testing.assert_array_equal(padded[0, 0, 0, 12], img[0, 0, 0, 0])


def test_to_tensor_to_array_roundtrip():
    rng = np.random.default_rng(4)
    hw_c = rng.uniform(size=(7, 9, 3)).astype(np.float32)
    t = to_tensor(hw_c)
    assert t.shape == (3, 7, 9)
    np.testing.assert_allclose(to_array(t[None]), hw_c, atol=0)
    hw = rng.uniform(size=(7, 9)).astype(np.float32)
    np.testing.assert_allclose(to_array(to_tensor(hw)[None]), hw, atol=0)


@pytest.mark.parametrize("wt", ["kaiser", "hann", "hamming", "bartlett"])
def test_windows_match_torch_periodic(wt):
    torch = pytest.importorskip("torch")
    n = 64
    fns = {"kaiser": lambda: torch.kaiser_window(n, periodic=True, beta=5.0),
           "hann": lambda: torch.hann_window(n, periodic=True),
           "hamming": lambda: torch.hamming_window(n, periodic=True),
           "bartlett": lambda: torch.bartlett_window(n, periodic=True)}
    w_t = fns[wt]().numpy()
    w = np.asarray(build_window((n, n), wt))
    np.testing.assert_allclose(w, np.outer(w_t, w_t), atol=1e-6, rtol=0)
