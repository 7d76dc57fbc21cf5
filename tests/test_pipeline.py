"""End-to-end pipeline parity and properties."""

import numpy as np
import jax
import jax.numpy as jnp

import polyblur_tpu as pt
from polyblur_tpu.pipeline import polyblur_core

from conftest import psnr


def test_e2e_fft_parity_vs_reference(ref):
    """Demo config (N=3, alpha=6, beta=1) on the half-res peacock must match
    the torch reference output within the 0.1 dB PSNR gate (BASELINE.md)."""
    out = polyblur_core(jnp.asarray(ref["e2e_in"]), n_iter=3, c=0.362,
                        b=0.468, alpha=6.0, beta=1.0, method="fft")
    agree = psnr(out, ref["e2e_out_fft"])
    assert agree > 40.0, f"PSNR vs reference output too low: {agree:.2f} dB"
    # PSNR-vs-input parity: same restoration strength as the reference
    p_ref = psnr(ref["e2e_out_fft"], ref["e2e_in"])
    p_jax = psnr(np.asarray(out), ref["e2e_in"])
    assert abs(p_ref - p_jax) < 0.1


def test_e2e_full_features_parity_vs_reference(ref):
    out = polyblur_core(jnp.asarray(ref["e2e_in"]), n_iter=2, c=0.362,
                        b=0.468, alpha=6.0, beta=1.0, method="fft",
                        remove_halo=True, edgetaping=True, prefiltering=True)
    agree = psnr(out, ref["e2e_out_full"])
    assert agree > 38.0, f"PSNR vs reference (full) too low: {agree:.2f} dB"


def test_golden_peacock_fullres_fft(ref, peacock):
    """Full-res golden-artifact config (N=3, alpha=6, beta=1, c=0.362,
    b=0.468 — README.md:42-45): match the live reference's output on the
    full peacock. ~59 dB agreement measured; gate with headroom."""
    x = jnp.asarray(peacock.transpose(2, 0, 1))[None]
    out = polyblur_core(x, n_iter=3, c=0.362, b=0.468, alpha=6.0, beta=1.0,
                        method="fft")
    agree = psnr(out, ref["e2e_out_fft_fullres"])
    assert agree > 55.0, f"full-res PSNR vs reference: {agree:.2f} dB"


def test_golden_peacock_artifact_psnr_pinned(ref, peacock):
    """Gate against the committed golden artifact
    (tests/data/peacock_restored_alpha_6_beta_1.png, the reference's only
    golden — README.md:42-45). The PNG predates the current reference code
    (the live reference lands ~30.4 dB from it), so the gate pins our
    PSNR-vs-PNG to the level the live reference achieves:

    Both paths gate at 0.05 dB — HALF the BASELINE bar: the fast path is
    now the exact fft operator (round-4 2D-spectral rewrite), so both
    measure delta 0.0000 on CPU; the budget covers TPU Mosaic matmul
    round-off.
    """
    from PIL import Image
    import os

    golden = np.asarray(
        Image.open(os.path.join(os.path.dirname(__file__), "data",
                                "peacock_restored_alpha_6_beta_1.png")))
    golden = (golden / 255.0).astype(np.float32)
    ref_level = float(ref["golden_psnr_ref_vs_png"])
    x = jnp.asarray(peacock.transpose(2, 0, 1))[None]
    for method, budget in (("fft", 0.05), ("direct_separable", 0.05)):
        out = polyblur_core(x, n_iter=3, c=0.362, b=0.468, alpha=6.0,
                            beta=1.0, method=method)
        level = psnr(np.asarray(out[0]).transpose(1, 2, 0), golden)
        assert abs(level - ref_level) <= budget, (
            f"{method}: PSNR vs golden {level:.2f} dB, reference achieves "
            f"{ref_level:.2f} dB")


def test_golden_peacock_fullres_separable(ref, peacock):
    """Fast-path-vs-reference-output gate at the demo config on the
    full-res peacock. History: round 2 measured 36.5 dB (fixed row shear,
    Keys cubic), round 3 ~52.2 dB (spectral-x ideal phase shear), round 4
    ~120 dB on CPU — the 2D-spectral operator IS the fft operator. Gate at
    the fft path's own 55 dB bar (covers TPU Mosaic round-off)."""
    x = jnp.asarray(peacock.transpose(2, 0, 1))[None]
    out = polyblur_core(x, n_iter=3, c=0.362, b=0.468, alpha=6.0, beta=1.0,
                        method="direct_separable")
    agree = psnr(out, ref["e2e_out_fft_fullres"])
    assert agree > 55.0, f"separable full-res PSNR vs reference: {agree:.2f} dB"


def test_e2e_improves_synthetic_blur():
    from scipy import ndimage
    from polyblur_tpu.ops.gaussian import gaussian_filter_np

    rng = np.random.default_rng(11)
    base = ndimage.gaussian_filter(rng.uniform(size=(160, 160)), 1.2)
    sharp = ((base > base.mean()).astype(np.float32) * 0.8 + 0.1)
    k = gaussian_filter_np((1.8, 0.9), 0.7, k_size=np.array([25, 25]))
    blurred = np.clip(
        ndimage.convolve(sharp, k, mode="wrap"), 0, 1).astype(np.float32)
    out = polyblur_core(jnp.asarray(blurred)[None, None], n_iter=3, c=0.362,
                        b=0.468, alpha=6.0, beta=1.0)
    p_blur = psnr(blurred, sharp)
    p_deblur = psnr(np.asarray(out[0, 0]), sharp)
    assert p_deblur > p_blur + 1.0, (p_blur, p_deblur)


def test_methods_agree():
    """FFT vs direct backends cross-check (the reference keeps both for this
    reason, deblurring.py:113-119). Interiors must agree closely."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(size=(1, 3, 64, 64)).astype(np.float32))
    a = polyblur_core(x, n_iter=1, alpha=6.0, beta=1.0, method="fft")
    b = polyblur_core(x, n_iter=1, alpha=6.0, beta=1.0, method="direct")
    np.testing.assert_allclose(a[..., 16:-16, 16:-16], b[..., 16:-16, 16:-16],
                               atol=5e-3, rtol=0)


def test_functional_numpy_adapter():
    rng = np.random.default_rng(6)
    img = rng.uniform(size=(48, 40, 3)).astype(np.float32)
    out = pt.polyblur_deblurring(img, n_iter=1)
    assert isinstance(out, np.ndarray) and out.shape == img.shape
    gray = rng.uniform(size=(48, 40)).astype(np.float32)
    outg = pt.polyblur_deblurring(gray, n_iter=1)
    assert outg.shape == gray.shape


def test_batch_equals_loop():
    """vmap semantics: a batch of 2 gives the same answers as 2 separate
    calls (kernels are estimated per batch element)."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(size=(2, 1, 48, 48)).astype(np.float32))
    both = polyblur_core(x, n_iter=2, alpha=4.0, beta=2.0)
    one = polyblur_core(x[:1], n_iter=2, alpha=4.0, beta=2.0)
    two = polyblur_core(x[1:], n_iter=2, alpha=4.0, beta=2.0)
    np.testing.assert_allclose(both[0], one[0], atol=1e-5, rtol=0)
    np.testing.assert_allclose(both[1], two[0], atol=1e-5, rtol=0)


def test_pipeline_differentiable_through_iterations():
    """BASELINE config 5: gradient through 3 scanned iterations (training-
    layer use case), with and without remat."""
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.uniform(size=(1, 1, 32, 32)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(size=(1, 1, 32, 32)).astype(np.float32))

    def loss(im, remat=False):
        out = polyblur_core(im, n_iter=3, alpha=6.0, beta=1.0, remat=remat)
        return jnp.mean((out - tgt) ** 2)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    g_remat = jax.grad(lambda im: loss(im, remat=True))(x)
    np.testing.assert_allclose(g, g_remat, atol=1e-6, rtol=0)


def test_grad_wrt_pipeline_parameters():
    """(c, b, alpha, beta) are traced leaves — learnable."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.uniform(size=(1, 1, 32, 32)).astype(np.float32))

    def loss(params):
        out = polyblur_core(x, n_iter=2, c=params[0], b=params[1],
                            alpha=params[2], beta=params[3])
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(jnp.asarray([0.362, 0.468, 6.0, 1.0]))
    assert np.isfinite(np.asarray(g)).all()


def test_bf16_pipeline_runs_and_tracks_f32():
    rng = np.random.default_rng(10)
    xf = jnp.asarray(rng.uniform(size=(1, 1, 64, 64)).astype(np.float32))
    xb = xf.astype(jnp.bfloat16)
    of = polyblur_core(xf, n_iter=1, alpha=4.0, beta=2.0)
    ob = polyblur_core(xb, n_iter=1, alpha=4.0, beta=2.0)
    assert ob.dtype == jnp.bfloat16
    assert psnr(np.asarray(ob, np.float32), np.asarray(of)) > 30.0


def test_constant_image_stays_finite():
    """Degenerate input (no gradients) must not NaN — a latent reference
    defect (normalize divides by max-min == 0); guarded here."""
    out = polyblur_core(jnp.full((1, 3, 40, 40), 0.5, jnp.float32), n_iter=3,
                        alpha=6.0, beta=1.0, remove_halo=True)
    assert np.isfinite(np.asarray(out)).all()


def test_prefilter_smoothers():
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.uniform(size=(1, 3, 48, 48)).astype(np.float32))
    for sm in ["bilateral", "domain_transform", "nc"]:
        out = polyblur_core(x, n_iter=1, alpha=4.0, beta=2.0,
                            prefiltering=True, smoother=sm)
        assert np.isfinite(np.asarray(out)).all(), sm


def test_method_auto_resolves_to_fft_off_tpu():
    """VERDICT r2 #3: library-level method='auto' (now the default) — on
    non-TPU backends it must resolve to the reference's own fft default
    and give bit-identical results to an explicit method='fft' call."""
    rng = np.random.default_rng(13)
    img = rng.uniform(size=(64, 56, 3)).astype(np.float32)
    out_auto = pt.polyblur_deblurring(img, n_iter=2, alpha=6.0, beta=1.0)
    out_fft = pt.polyblur_deblurring(img, n_iter=2, alpha=6.0, beta=1.0,
                                     method="fft")
    np.testing.assert_array_equal(out_auto, out_fft)


def test_verbose_prints_per_stage_and_matches(capsys):
    """VERDICT r2 missing #2: verbose=True prints the reference's
    per-stage timing lines (deblurring.py:59-90) and the stage-split run
    is mathematically identical to the fused scan."""
    rng = np.random.default_rng(14)
    img = rng.uniform(size=(48, 48, 3)).astype(np.float32)
    quiet = pt.polyblur_deblurring(img, n_iter=2, alpha=6.0, beta=1.0,
                                   method="fft")
    loud = pt.polyblur_deblurring(img, n_iter=2, alpha=6.0, beta=1.0,
                                  method="fft", verbose=True)
    cap = capsys.readouterr().out
    assert "-- init tensors:" in cap
    assert "-- blur estimation 1:" in cap and "-- blur estimation 2:" in cap
    assert "-- deblurring 1:" in cap and "-- deblurring 2:" in cap
    np.testing.assert_allclose(loud, quiet, atol=1e-6, rtol=0)


def test_verbose_with_features_matches(capsys):
    rng = np.random.default_rng(15)
    img = rng.uniform(size=(48, 48, 3)).astype(np.float32)
    kw = dict(n_iter=2, alpha=6.0, beta=1.0, method="fft",
              prefiltering=True, remove_halo=True, edgetaping=True)
    quiet = pt.polyblur_deblurring(img, **kw)
    loud = pt.polyblur_deblurring(img, verbose=True, **kw)
    assert "-- deblurring 2:" in capsys.readouterr().out
    np.testing.assert_allclose(loud, quiet, atol=1e-6, rtol=0)


def test_pipeline_honors_ker_size():
    """ker_size flows through the whole pipeline on both spatial methods
    (the separable fast path silently pinned 25 taps in round 2). A
    heavily blurred input drives the estimate toward sigma ~4, where the
    25- vs 31-tap truncation carries real mass (noise would estimate a
    near-delta kernel and mask the difference)."""
    from scipy import ndimage

    rng = np.random.default_rng(16)
    base = ndimage.gaussian_filter(
        rng.uniform(size=(96, 96)), 4.0).astype(np.float32)
    base = (base - base.min()) / (base.max() - base.min())
    x = jnp.asarray(base)[None, None]
    # c=2.0/b=0.1 drives both sigma and rho estimates to the 4.0 clamp so
    # the 25- vs 31-tap truncation carries real mass
    for method in ("direct_separable", "fft"):
        o25 = polyblur_core(x, n_iter=1, c=2.0, b=0.1, alpha=6.0, beta=1.0,
                            method=method, ker_size=25)
        o31 = polyblur_core(x, n_iter=1, c=2.0, b=0.1, alpha=6.0, beta=1.0,
                            method=method, ker_size=31)
        assert o31.shape == x.shape
        if method == "direct_separable":
            assert float(jnp.max(jnp.abs(o31 - o25))) > 1e-5


def test_corpus_parity_per_method():
    """Structurally diverse parity corpus (VERDICT r2 item #8): oriented
    edges, 1/f texture, clipped highlights, low contrast — each blurred
    with a known anisotropic kernel and restored by the LIVE reference
    (tests/make_fixtures.py::make_corpus). Gates per method:

    * fft: machine-precision agreement (measured 120 dB on all four);
    * direct_separable: also machine precision since round 4 (the fast
      path is the exact fft operator) — gated at 60 dB agreement and
      0.05 dB strength (HALF the 0.1 dB BASELINE bar, covering TPU
      Mosaic round-off; measured 120 dB / 0.0000-0.0001 dB on CPU).
    """
    import os

    fx = np.load(os.path.join(os.path.dirname(__file__), "data",
                              "corpus_fixtures.npz"))
    for name in ("edges", "texture", "saturation", "lowcontrast"):
        x = jnp.asarray(fx[f"{name}_in"])[None, None]
        tgt = fx[f"{name}_out_fft"]
        sharp = fx[f"{name}_sharp"]
        kw = dict(n_iter=3, c=0.362, b=0.468, alpha=6.0, beta=1.0)
        out_fft = polyblur_core(x, method="fft", **kw)
        assert psnr(out_fft[0, 0], tgt[0, 0]) > 60.0, name
        assert abs(psnr(out_fft[0, 0], sharp) - psnr(tgt[0, 0], sharp)) < 0.1
        out_sep = polyblur_core(x, method="direct_separable", **kw)
        agree = psnr(out_sep[0, 0], tgt[0, 0])
        assert agree > 60.0, (name, agree)
        d = abs(psnr(out_sep[0, 0], sharp) - psnr(tgt[0, 0], sharp))
        assert d < 0.05, (name, d)


def test_bf16_corpus_strength_tracks_f32():
    """VERDICT r3 weak #1: bf16 quality at REAL scale, not the 64x64 toy.
    The headline benchmark ships bf16 tiles (bench.py), so a bf16-specific
    numerics regression must fail the suite: per corpus image, the bf16
    pipeline's restoration strength (PSNR vs sharp) must stay within
    0.2 dB of the f32 fast path's, with >= 40 dB output agreement.
    Measured on CPU: deltas 0.012-0.146 dB, agreement 46-50 dB. The
    on-hardware counterpart (real Mosaic bf16 MXU dots through the mega
    kernel) is test_hardware.py::test_bf16_golden_strength_on_tpu."""
    import os

    fx = np.load(os.path.join(os.path.dirname(__file__), "data",
                              "corpus_fixtures.npz"))
    for name in ("edges", "texture", "saturation", "lowcontrast"):
        x = jnp.asarray(fx[f"{name}_in"])[None, None]
        sharp = fx[f"{name}_sharp"]
        kw = dict(n_iter=3, c=0.362, b=0.468, alpha=6.0, beta=1.0,
                  method="direct_separable")
        of = polyblur_core(x, **kw)
        ob = polyblur_core(x.astype(jnp.bfloat16), **kw)
        assert ob.dtype == jnp.bfloat16
        ob32 = np.asarray(ob, np.float32)
        assert psnr(ob32[0, 0], np.asarray(of)[0, 0]) > 40.0, name
        d = abs(psnr(ob32[0, 0], sharp) - psnr(np.asarray(of)[0, 0], sharp))
        assert d < 0.2, (name, d)


def test_auto_tile_plan_grid_choice():
    """method='auto' tiling picks the cheapest aligned grid per size and
    stays whole-image when the blocked route costs less — no fixed-grid
    padding cliff just past the whole-image envelope."""
    from polyblur_tpu.api import _auto_tile_plan, _auto_tile_wanted

    # 12MP: tiling wanted; the MAC model picks 448/384 (more redundant
    # pixels than 576/512 but ~27% fewer y-DFT MACs — the measured
    # round-5 sweep winner, tools/grid_ab.py)
    assert _auto_tile_wanted(3000, 4000, cap=640)
    plan = _auto_tile_plan(3000, 4000, cap=640)
    assert plan is not None and plan[0] == 448
    assert int(448 * (1 - plan[1])) == 384
    # near-exact 512-step fit: 576/512's redundancy collapses to ~1.06x
    # and it wins on the MAC model too
    plan = _auto_tile_plan(2048, 2048, cap=640)
    assert plan is not None and plan[0] == 576
    # small images past the envelope stay whole-image (reference-exact
    # single global estimate; the blocked route serves them fast) — no
    # fixed-576-grid padding cliff at 704px
    assert not _auto_tile_wanted(704, 704, cap=640)
    assert not _auto_tile_wanted(500, 700, cap=640)   # the peacock demo
    assert not _auto_tile_wanted(1024, 1400, cap=640)  # 1.4MP
    # dt-prefilter cap restricts candidates to <= 512
    plan = _auto_tile_plan(3000, 4000, cap=512)
    assert plan is not None and plan[0] <= 512
    # thin panorama below the area threshold: stays whole-image — the
    # blocked route works on rectangles directly (no square working
    # frame), so a 0.3MP strip costs 0.3MP, not max(h, w)^2
    assert not _auto_tile_wanted(3000, 100, cap=640)
    # a genuinely large panorama still tiles (area rule)
    assert _auto_tile_wanted(12000, 400, cap=640)


def test_verbose_mega_config_returns_fused_result_shape():
    """verbose must never change the returned pixels: when the normal path
    would dispatch the fused mega kernel, _run_verbose re-runs it. On CPU
    the mega gate is off, so this just pins the equality contract."""
    rng = np.random.default_rng(21)
    img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    kw = dict(n_iter=1, alpha=6.0, beta=1.0, method="direct_separable")
    quiet = pt.polyblur_deblurring(img, **kw)
    loud = pt.polyblur_deblurring(img, verbose=True, **kw)
    np.testing.assert_allclose(loud, quiet, atol=1e-6, rtol=0)


# ---------------------------------------------------------------------------
# High-resolution corpus gates (VERDICT r4 next-step #3): the DIV2K-clause
# stand-in — 12 committed ~2MP images (tests/data/corpus_hr, generated by
# tests/make_corpus_photos.py; see its README for the family rationale).
# Each is degraded with a KNOWN anisotropic kernel + 1% noise so
# restoration strength (PSNR vs sharp) is meaningful.

def _hr_corpus_names():
    import os

    d = os.path.join(os.path.dirname(__file__), "data", "corpus_hr")
    return d, sorted(os.path.splitext(f)[0] for f in os.listdir(d)
                     if f.endswith(".png"))


def _hr_corpus_case(path, name, idx, rng):
    """(sharp, blurred) 1024^2 RGB pair for one corpus image: circular
    anisotropic Gaussian blur (known kernel, FFT-applied == ndimage
    'wrap') + 1% Gaussian noise — the calibration script's degradation
    model (reference calibrate_blur_parameters.py:12-35)."""
    import os

    from PIL import Image

    from polyblur_tpu.ops.gaussian import gaussian_filter_np

    sharp = np.asarray(Image.open(os.path.join(path, name + ".png"))
                       ).astype(np.float32) / 255.0
    sharp = sharp[:1024, 256:1280]
    sigma = 0.8 + 0.25 * idx
    rho = 0.5 + 0.1 * (idx % 4)
    theta = (idx * 29) % 180 * np.pi / 180
    k = gaussian_filter_np((sigma, rho), theta, k_size=np.array([25, 25]))
    h, w = sharp.shape[:2]
    psf = np.zeros((h, w), np.float32)
    psf[:25, :25] = k
    psf = np.roll(psf, (-12, -12), axis=(0, 1))
    otf = np.fft.rfft2(psf)
    blurred = np.stack(
        [np.fft.irfft2(np.fft.rfft2(sharp[..., c]) * otf, s=(h, w))
         for c in range(3)], axis=-1)
    blurred = blurred + rng.normal(0.0, 0.01, blurred.shape)
    return sharp, np.clip(blurred, 0.0, 1.0).astype(np.float32)


_HR_KW = dict(n_iter=3, c=0.362, b=0.468, alpha=6.0, beta=1.0)


def test_hr_corpus_fast_path_strength_parity():
    """0.05 dB fast-vs-fft strength parity + >=60 dB agreement on every
    hr-corpus image (measured: 120 dB agreement, 0.0000 dB delta on all
    12 — the fast path is the exact fft operator; the budget covers TPU
    Mosaic round-off when this runs on hardware)."""
    path, names = _hr_corpus_names()
    assert len(names) >= 10, names
    rng = np.random.default_rng(42)
    for i, name in enumerate(names):
        sharp, blurred = _hr_corpus_case(path, name, i, rng)
        x = jnp.asarray(blurred.transpose(2, 0, 1))[None]
        o_fft = np.asarray(polyblur_core(x, method="fft", **_HR_KW)
                           )[0].transpose(1, 2, 0)
        o_sep = np.asarray(polyblur_core(x, method="direct_separable",
                                         **_HR_KW))[0].transpose(1, 2, 0)
        agree = psnr(o_sep, o_fft)
        assert agree > 60.0, (name, agree)
        d = abs(psnr(o_fft, sharp) - psnr(o_sep, sharp))
        assert d < 0.05, (name, d)


def test_hr_corpus_bf16_strength():
    """bf16-at-scale strength gate on every hr-corpus image: the serving
    pipeline ships bf16 tiles, so per image the bf16 fast path must stay
    within 0.2 dB of the f32 fast path (measured deltas 0.004-0.159 dB,
    agreement 47.7-54.3 dB)."""
    path, names = _hr_corpus_names()
    rng = np.random.default_rng(42)
    for i, name in enumerate(names):
        sharp, blurred = _hr_corpus_case(path, name, i, rng)
        x = jnp.asarray(blurred.transpose(2, 0, 1))[None]
        of = np.asarray(polyblur_core(x, method="direct_separable",
                                      **_HR_KW))[0].transpose(1, 2, 0)
        ob = np.asarray(polyblur_core(x.astype(jnp.bfloat16),
                                      method="direct_separable", **_HR_KW),
                        np.float32)[0].transpose(1, 2, 0)
        assert psnr(ob, of) > 40.0, name
        d = abs(psnr(ob, sharp) - psnr(of, sharp))
        assert d < 0.2, (name, d)
