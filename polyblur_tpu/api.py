"""Public API: the functional entry point and the stateless layer class.

Mirrors the reference surface exactly — the two exported names of
/root/reference/polyblur/__init__.py:1 — including the NumPy adapter
(deblurring.py:45-50, :93-96): ``(H, W)`` / ``(H, W, C)`` ndarrays are
accepted and returned as such; JAX arrays must be ``(B, C, H, W)``.

Unlike the reference's ``nn.Module`` (which holds no parameters or buffers —
deblurring.py:260-264), :class:`PolyblurDeblurring` is a plain callable
around pure jitted functions; it composes inside training losses because the
whole pipeline is differentiable (use ``jax.grad`` straight through it).
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax.numpy as jnp

from .config import PolyblurConfig, FUNCTIONAL_DEFAULTS, MODULE_DEFAULTS
from .patches import deblur_patches
from .pipeline import polyblur_core
from .utils.imaging import to_tensor, to_array

__all__ = ["polyblur_deblurring", "PolyblurDeblurring"]

#: Candidate (patch, step) grids for ``method='auto'`` tiling, all with
#: statically (8, 128)-aligned steps (no-de-offset DMA + fused overlap-add)
#: and 64px seams >= 2x the 25-tap kernel support. 576/512 has the lowest
#: tile redundancy on large images but the highest MXU MACs per output
#: pixel (the spectral kernel's y-DFT pair is quadratic in tile height);
#: the smaller grids also avoid the padding cliff for images just past
#: the whole-image envelope (a fixed 576 grid inflates a 704px image to
#: a 1088px canvas — 2.7x the pixels).
_TILE_CANDIDATES = ((576, 512), (448, 384), (320, 256))

# Cost-model constants (hardware-measured; single source of truth in
# envelopes.py, re-validated by tests/test_hardware.py's cost-model and
# boundary-sweep tests).
from .envelopes import (BLOCKED_COST_MACS_PX as _BLOCKED_COST_MACS_PX,
                        TILE_FIXED_MACS as _TILE_FIXED_MACS,
                        AUTO_TILE_MIN_AREA as _AUTO_TILE_MIN_AREA)


def _auto_tile_wanted(h: int, w: int, cap: int) -> bool:
    """Whether ``method='auto'`` should consider tiling at all: the image
    is past the whole-image mega envelope AND large enough that the tiled
    mega kernel's rate advantage dominates (the blocked route works on
    rectangles directly, so thin panoramas no longer need a special
    case)."""
    return max(h, w) > cap and h * w >= _AUTO_TILE_MIN_AREA


def _tile_macs(ph: int, pw: int) -> float:
    """Modeled MXU MACs of ONE spectral-mega-kernel tile (per channel per
    iteration): with the 24px kernel-support apron (hh = ph+24,
    wc = pw+24), the x-rDFT/irDFT pair is linear in width (2*hh*wc
    accumulation rows) while the y-DFT/iDFT pair is QUADRATIC in height
    (4*hh^2), both times the lane-padded half-spectrum depth. This is
    tools/grid_ab.py's model; the round-5 12MP sweep it predicted is in
    docs/ROUND5_NOTES.md."""
    hh, wc = ph + 24, pw + 24
    kp = -(-(wc // 2 + 1) // 128) * 128
    return float((2 * hh * wc + 4 * hh * hh) * 2 * kp)


def _auto_tile_plan(h: int, w: int, cap: int):
    """(patch_size, overlap) of the cheapest candidate tiling, or None when
    the whole-image blocked route costs less.

    Cost = number of tiles x (modeled tile MACs + fixed per-tile cost)
    vs the blocked route at its measured per-pixel MAC handicap. The MAC
    model (not tile AREA) is what the hardware sweep validates: at 12MP
    the 448/384 grid carries MORE redundant pixels than 576/512 yet
    measures ~28% faster, because the y-DFT matmuls scale with tile
    height squared. ``cap`` is the mega-kernel tile envelope for the
    requested feature set (pipeline.mega_tile_cap)."""
    best = None
    for p, s in _TILE_CANDIDATES:
        if p > cap:
            continue
        ch = int(math.ceil(max(h - p, 0) / s)) * s + p
        cw = int(math.ceil(max(w - p, 0) / s)) * s + p
        n_tiles = ((ch - p) // s + 1) * ((cw - p) // s + 1)
        cost = n_tiles * (_tile_macs(p, p) + _TILE_FIXED_MACS)
        if best is None or cost < best[0]:
            best = (cost, p, s)
    if best is not None and best[0] < _BLOCKED_COST_MACS_PX * h * w:
        return best[1], (best[1] - best[2]) / best[1]
    return None


def _resolve_auto(method: str) -> str:
    """``'auto'`` -> the TPU fast path on TPU, fft elsewhere (the
    reference's direct-on-CUDA / fft-on-CPU selection, main.py:109-112)."""
    if method != "auto":
        return method
    import jax

    return "direct_separable" if jax.default_backend() == "tpu" else "fft"


def _run(img: jnp.ndarray, cfg: PolyblurConfig) -> jnp.ndarray:
    return polyblur_core(img, **cfg.traced_kwargs(), **cfg.static_kwargs())


def _run_verbose(img: jnp.ndarray, cfg: PolyblurConfig) -> jnp.ndarray:
    """Per-stage timed execution mirroring the reference's ``verbose``
    prints (deblurring.py:59-90). The loop runs stage-by-stage in Python
    with a forced device sync after each stage so the deltas are real
    device times, not dispatch times.

    The RETURNED pixels are always identical to the ``verbose=False``
    path: when the normal path dispatches the fused mega kernel (whose
    output agrees with these composed stages only to ~2e-4), this re-runs
    it and returns that result — verbose is a debug mode and must never
    change the answer it is debugging.
    """
    from time import time as _time

    from . import restoration
    from .estimation import gaussian_blur_estimation
    from .ops.fourier import spectral_gradients
    from .pipeline import edge_aware_filtering
    from .utils.profiling import force_execution

    start = _time()
    impred = img
    grad_img = spectral_gradients(img) if cfg.remove_halo else None
    if grad_img is not None:
        force_execution(grad_img[0])
    print("-- init tensors:      %1.5f" % (_time() - start))

    return_2d_filters = cfg.method != "direct_separable"
    for n in range(cfg.n_iter):
        start = _time()
        kernel = gaussian_blur_estimation(
            impred, c=cfg.c, b=cfg.b, q=cfg.q, n_angles=cfg.n_angles,
            n_interpolated_angles=cfg.n_interpolated_angles,
            ker_size=cfg.ker_size,
            discard_saturation=cfg.discard_saturation,
            multichannel=cfg.multichannel_kernel,
            return_2d_filters=return_2d_filters)
        force_execution(kernel[0] if isinstance(kernel, tuple) else kernel)
        print("-- blur estimation %d: %1.5f" % (n + 1, _time() - start))

        start = _time()
        if cfg.prefiltering:
            smooth, noise = edge_aware_filtering(
                impred, cfg.sigma_s, cfg.sigma_r, smoother=cfg.smoother)
            impred = restoration.inverse_filtering_rank3(
                smooth, kernel, alpha=cfg.alpha, beta=cfg.beta,
                remove_halo=cfg.remove_halo, do_edgetaper=cfg.edgetaping,
                grad_img=grad_img, method=cfg.method, ker_size=cfg.ker_size)
            impred = impred + noise
        else:
            impred = restoration.inverse_filtering_rank3(
                impred, kernel, alpha=cfg.alpha, beta=cfg.beta,
                remove_halo=cfg.remove_halo, do_edgetaper=cfg.edgetaping,
                grad_img=grad_img, method=cfg.method, ker_size=cfg.ker_size)
        impred = jnp.clip(impred, 0.0, 1.0)
        force_execution(impred)
        print("-- deblurring %d:      %1.5f" % (n + 1, _time() - start))

    from .pipeline import _mega_static_ok

    if _mega_static_ok(cfg.method, cfg.remat, cfg.discard_saturation,
                       cfg.multichannel_kernel, cfg.prefiltering,
                       cfg.smoother, cfg.q, cfg.ker_size, cfg.n_angles,
                       cfg.n_interpolated_angles, img.shape[-2],
                       img.shape[-1]):
        return _run(img, cfg)  # the fused-kernel result, as verbose=False
    return impred


def _adapt_in(img):
    """numpy (H,W)/(H,W,C) -> ((1,C,H,W) jax array, was_numpy flag)."""
    if isinstance(img, np.ndarray):
        if img.ndim not in (2, 3):
            raise ValueError(
                "numpy input must be (H, W) or (H, W, C) — pass a "
                f"(B, C, H, W) jax array for batches; got shape {img.shape}")
        return to_tensor(img)[None], True
    img = jnp.asarray(img)
    if img.ndim != 4:
        raise ValueError(
            f"expected (B, C, H, W) array or numpy image, got shape {img.shape}")
    return img, False


def polyblur_deblurring(img, n_iter: int = 1, c=0.352, b=0.768, alpha=2.0,
                        beta=3.0, sigma_r=0.8, sigma_s=2.0, ker_size: int = 25,
                        q: float = 0.0, n_angles: int = 6,
                        n_interpolated_angles: int = 30,
                        remove_halo: bool = False, edgetaping: bool = False,
                        prefiltering: bool = False,
                        discard_saturation: bool = False,
                        multichannel_kernel: bool = False,
                        method: str = "auto",
                        verbose: bool = False):
    """Blind deblurring of mildly blurred image(s) — functional Polyblur.

    Same 17-kwarg surface as the reference functional API
    (deblurring.py:23-96), same defaults except ``method``: the default is
    ``'auto'``, which resolves to the TPU fast path on TPU and to the
    reference's own ``'fft'`` default elsewhere (matching the reference's
    direct-on-CUDA / fft-on-CPU demo selection, main.py:109-112). Pass
    ``method='fft'`` explicitly for reference-exact semantics on any
    backend. ``img`` is a numpy ``(H, W)``/``(H, W, C)`` image or a
    ``(B, C, H, W)`` array in [0, 1]; the return type matches the input.

    On TPU, ``method='auto'`` additionally engages the overlapping-patch
    engine (the reference's large-image mode, deblurring.py:269-340) for
    genuinely large images (>= ~4MP, or thin panoramas whose square
    working frame would blow up the whole-image route), picking the
    cheapest of the TPU-aligned candidate grids (576/512, 448/384,
    320/256) for the image's size. Everything smaller — including the
    reference's 700px demo — keeps reference-exact whole-image semantics
    (one global blur estimate) on the fused/blocked routes. NOTE the
    semantics change that comes with tiling, exactly as in the reference's
    patch mode: the blur is then estimated per tile, which doubles as
    spatially-varying-blur handling. Explicit ``method=`` values always
    run whole-image. Output shape always matches the input
    (odd sizes are edge-padded to even around the patch engine, unlike the
    reference module's even-crop).

    ``verbose`` prints the reference's per-stage timing lines
    (deblurring.py:59-90) with forced device syncs between stages. The
    timings are measured on the composed per-stage pipeline; the returned
    pixels are always those of the ``verbose=False`` path (when the fused
    mega kernel serves that path, its output — which agrees with the
    composed stages to ~2e-4 — is what is returned).
    """
    x, was_numpy = _adapt_in(img)
    resolved = _resolve_auto(method)
    cfg = FUNCTIONAL_DEFAULTS.replace(
        n_iter=n_iter, c=c, b=b, alpha=alpha, beta=beta, sigma_r=sigma_r,
        sigma_s=sigma_s, ker_size=ker_size, q=q, n_angles=n_angles,
        n_interpolated_angles=n_interpolated_angles, remove_halo=remove_halo,
        edgetaping=edgetaping, prefiltering=prefiltering,
        discard_saturation=discard_saturation,
        multichannel_kernel=multichannel_kernel, method=resolved)
    import jax

    h, w = x.shape[-2:]
    plan = None
    if method == "auto" and jax.default_backend() == "tpu":
        from .pipeline import mega_tile_cap

        cap = mega_tile_cap(prefiltering, cfg.smoother)
        if _auto_tile_wanted(h, w, cap):
            plan = _auto_tile_plan(h, w, cap)
    if plan is not None:
        from .utils.profiling import record_dispatch

        record_dispatch("polyblur_deblurring", f"auto_tiled/{plan[0]}")
        # The patch engine even-crops (reference deblurring.py:273-279);
        # edge-pad odd axes by one first so the output shape matches the
        # input (the functional API's contract, unlike the module's
        # reference-parity even-crop).
        xe = x
        if h % 2 or w % 2:
            xe = jnp.pad(x, ((0, 0), (0, 0), (0, h % 2), (0, w % 2)),
                         mode="edge")
        if verbose:
            from .utils.profiling import stage_timer, force_execution

            with stage_timer("polyblur_deblurring (auto-tiled, incl. any "
                             "compile)"):
                out = deblur_patches(xe, patch_size=plan[0], overlap=plan[1],
                                     batch_size=0, **cfg.traced_kwargs(),
                                     **cfg.static_kwargs())
                force_execution(out)
        else:
            out = deblur_patches(xe, patch_size=plan[0], overlap=plan[1],
                                 batch_size=0, **cfg.traced_kwargs(),
                                 **cfg.static_kwargs())
        out = out[..., :h, :w]
    elif verbose:
        out = _run_verbose(x, cfg)
    else:
        out = _run(x, cfg)
    return to_array(out) if was_numpy else out


class PolyblurDeblurring:
    """Stateless deblurring layer with an optional overlapping-patch engine.

    Mirrors the reference module (deblurring.py:250-394, with the
    ``handling_saturation`` crash of :289 fixed): the constructor stores only
    the patch configuration; ``__call__`` matches ``forward``'s surface and
    defaults (deblurring.py:266-268). ``device`` is accepted for parity and
    ignored — placement is JAX's job (``jax.device_put`` / shardings).

    For multi-chip tiling use ``parallel.sharding.deblur_sharded`` which
    shards the tile axis of the same patch engine over a device mesh.
    """

    def __init__(self, patch_decomposition: bool = False, patch_size: int = 400,
                 patch_overlap: float = 0.25, batch_size: int = 0):
        self.patch_decomposition = patch_decomposition
        self.patch_size = patch_size
        self.patch_overlap = patch_overlap
        # Memory ceiling: at most batch_size tile coordinates per device
        # batch, like the reference's sequential loop (deblurring.py:310-336).
        # batch_size <= 0 processes all tiles as one device batch — the
        # deliberate TPU-native default (the reference defaults to 1 for GPU
        # memory, deblurring.py:251; chunking every tile singly would
        # serialize the device and disqualify the fused image route here).
        self.batch_size = batch_size

    def __call__(self, images, n_iter: int = 1, c=0.352, b=0.468, alpha=2.0,
                 beta=4.0, sigma_s=2.0, ker_size: int = 25, sigma_r=0.4,
                 q: float = 0.0, n_angles: int = 6,
                 n_interpolated_angles: int = 30, remove_halo: bool = False,
                 edgetaping: bool = False, prefiltering: bool = False,
                 discard_saturation: bool = False,
                 multichannel_kernel: bool = False, method: str = "auto",
                 device: Optional[object] = None):
        del device
        method = _resolve_auto(method)
        cfg = MODULE_DEFAULTS.replace(
            n_iter=n_iter, c=c, b=b, alpha=alpha, beta=beta, sigma_r=sigma_r,
            sigma_s=sigma_s, ker_size=ker_size, q=q, n_angles=n_angles,
            n_interpolated_angles=n_interpolated_angles,
            remove_halo=remove_halo, edgetaping=edgetaping,
            prefiltering=prefiltering, discard_saturation=discard_saturation,
            multichannel_kernel=multichannel_kernel, method=method)
        x, was_numpy = _adapt_in(images)
        if self.patch_decomposition:
            out = deblur_patches(
                x, patch_size=self.patch_size, overlap=self.patch_overlap,
                batch_size=self.batch_size,
                **cfg.traced_kwargs(), **cfg.static_kwargs())
        else:
            out = _run(x, cfg)
        return to_array(out) if was_numpy else out

    # torch-API compatibility shims: the reference class is an nn.Module that
    # users `.to(device)` and call via `forward` (README.md:69-80).
    def forward(self, images, **kw):
        return self(images, **kw)

    def to(self, device=None):
        return self

    def eval(self):
        return self
