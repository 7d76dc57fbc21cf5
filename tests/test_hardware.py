"""Hardware (real-TPU) numerics and dispatch checks.

Skipped in the default CPU test run; enable with

    POLYBLUR_HW_TESTS=1 python -m pytest tests/test_hardware.py -q

on a machine with a TPU attached. These pin the properties that interpret
mode cannot check: real-Mosaic kernel numerics, the TPU-only dispatch
guards, and the DMA tile-extraction route.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import psnr

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="requires a real TPU backend (POLYBLUR_HW_TESTS=1)")

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def peacock_x(peacock):
    return jnp.asarray(peacock.transpose(2, 0, 1))[None]


def test_fft_path_matches_reference_fixture_on_tpu(ref, peacock_x):
    """TPU fft-path numerics vs the torch-reference fixture (the CPU run
    gates this at 55 dB; hardware has measured ~120 dB)."""
    from polyblur_tpu.pipeline import polyblur_core

    out = polyblur_core(peacock_x, n_iter=3, c=0.362, b=0.468, alpha=6.0,
                        beta=1.0, method="fft")
    assert psnr(out, ref["e2e_out_fft_fullres"]) > 55.0


def test_mega_kernel_dispatch_and_parity_on_tpu(peacock_x):
    """A <=640px whole image must take the real mega kernel and agree with
    the composed XLA path."""
    from polyblur_tpu.pipeline import polyblur_core
    from polyblur_tpu.utils.profiling import dispatch_log, reset_dispatch_log

    x = peacock_x[..., :448, :448]
    reset_dispatch_log()
    out = polyblur_core(x, n_iter=2, c=0.362, b=0.468, alpha=6.0, beta=1.0,
                        method="direct_separable")
    assert ("polyblur_core", "mega_pallas") in dispatch_log()
    ref = polyblur_core(x, n_iter=2, c=0.362, b=0.468, alpha=6.0, beta=1.0,
                        method="direct_separable", _disable_mega=True)
    assert psnr(out, ref) > 38.0


def test_dma_image_route_bit_matches_tiles_route_on_tpu(peacock_x):
    """deblur_patches' DMA mega route (aligned grid) must bit-match the
    extract+tiles route on hardware."""
    from polyblur_tpu.patches import deblur_patches
    from polyblur_tpu.utils.profiling import dispatch_log, reset_dispatch_log

    kw = dict(n_iter=2, c=0.362, b=0.468, alpha=6.0, beta=1.0,
              method="direct_separable")
    reset_dispatch_log()
    a = deblur_patches(peacock_x, patch_size=448, overlap=1.0 / 7.0, **kw)
    assert ("deblur_patches", "mega_image_dma") in dispatch_log()
    # batch_size forces the chunked tiles route past the DMA guard
    b = deblur_patches(peacock_x, patch_size=448, overlap=1.0 / 7.0,
                       batch_size=1, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pallas_bilateral_matches_xla_on_tpu(peacock_x):
    from polyblur_tpu.ops.bilateral import _bilateral_xla
    from polyblur_tpu.ops.pallas.bilateral import bilateral_pallas

    x = peacock_x[..., :400, :400]
    ref = _bilateral_xla(x, 5, 5.0, 0.1)
    got = bilateral_pallas(x, 5, 5.0, 0.1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_pallas_iir_matches_xla_on_tpu():
    from polyblur_tpu.ops.domain_transform import iir_scan_rows
    from polyblur_tpu.ops.pallas.iir import iir_scan_rows_pallas

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(1, 3, 600, 800)).astype(np.float32))
    v = jnp.asarray(
        rng.uniform(0.1, 0.9, size=(1, 3, 600, 800)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(iir_scan_rows_pallas(x, v)),
                               np.asarray(iir_scan_rows(x, v)), atol=1e-5)


def test_windowed_nc_matches_generic_on_tpu():
    """The gather-free windowed NC formulation (static radius) must match
    the generic searchsorted path on real-Mosaic numerics."""
    import math

    from polyblur_tpu.ops.domain_transform import (
        _box_filter_rows, _box_filter_rows_windowed)

    rng = np.random.default_rng(1)
    F = jnp.asarray(rng.uniform(size=(1, 3, 300, 400)).astype(np.float32))
    steps = 1.0 + 4.0 * rng.uniform(size=(1, 300, 400)).astype(np.float32)
    ct = jnp.cumsum(jnp.asarray(steps), axis=-1)
    for r in (1.7, 5.2):
        a = _box_filter_rows_windowed(F, ct, r)
        b = _box_filter_rows(F, ct, jnp.float32(r))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=0)


def test_recursive_filter_pallas_matches_xla_on_tpu():
    """The blocked Pallas IIR backend must match the XLA associative scan
    through the full recursive_filter at a realistic size."""
    from polyblur_tpu.ops.domain_transform import recursive_filter

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(size=(1, 3, 500, 700)).astype(np.float32))
    a = recursive_filter(x, sigma_s=2.0, sigma_r=0.4, backend="pallas")
    b = recursive_filter(x, sigma_s=2.0, sigma_r=0.4, backend="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=5e-5, rtol=0)
