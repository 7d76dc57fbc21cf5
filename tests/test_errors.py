"""Error-path and input-validation probes (the API boundary contract).

The reference crashes with raw torch errors on malformed input; this
framework promises actionable ValueErrors at the API boundary instead.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import polyblur_tpu as pt


def test_wrong_rank_jax_input_raises():
    with pytest.raises(ValueError, match=r"B, C, H, W"):
        pt.polyblur_deblurring(jnp.zeros((3, 48, 48), jnp.float32))
    with pytest.raises(ValueError, match=r"B, C, H, W"):
        pt.polyblur_deblurring(jnp.zeros((48, 48), jnp.float32))


def test_unknown_method_raises():
    x = jnp.zeros((1, 1, 48, 48), jnp.float32)
    with pytest.raises(ValueError, match="not implemented"):
        pt.polyblur_deblurring(x, n_iter=1, method="fourier")


def test_unknown_smoother_raises():
    from polyblur_tpu.pipeline import edge_aware_filtering

    x = jnp.zeros((1, 1, 48, 48), jnp.float32)
    with pytest.raises(ValueError, match="unknown smoother"):
        edge_aware_filtering(x, 2.0, 0.4, smoother="median")


def test_unknown_window_type_raises():
    from polyblur_tpu.utils.imaging import build_window

    with pytest.raises(ValueError):
        build_window((32, 32), "blackman-harris-typo")


def test_separable_param_shape_raises():
    from polyblur_tpu.ops.sep_poly import compute_polynomial_separable

    x = jnp.zeros((1, 1, 48, 48), jnp.float32)
    with pytest.raises(ValueError, match=r"\(B, C'\)"):
        compute_polynomial_separable(
            x, jnp.asarray(1.5), jnp.asarray(0.8), jnp.asarray(0.0),
            6.0, 1.0)


def test_numpy_uint8_input_roundtrip():
    """uint8 numpy in -> float restoration -> same-shape output (the
    to_tensor adapter must normalize dtype like the reference's
    img_as_float32 path, utils.py:8-21)."""
    rng = np.random.default_rng(0)
    img = (rng.uniform(size=(50, 62, 3)) * 255).astype(np.uint8)
    out = pt.polyblur_deblurring(img, n_iter=1)
    assert out.shape == (50, 62, 3)
    assert out.dtype == np.float32
    assert np.isfinite(out).all()
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_tiny_image_smaller_than_kernel_support():
    """Images smaller than the 25-tap support must not crash (the padding
    paths handle h, w < ker_size)."""
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(20, 18)).astype(np.float32)
    out = pt.polyblur_deblurring(img, n_iter=1)
    assert out.shape == (20, 18)
    assert np.isfinite(out).all()
