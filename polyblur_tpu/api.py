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

from typing import Optional

import numpy as np
import jax.numpy as jnp

from .config import PolyblurConfig, FUNCTIONAL_DEFAULTS, MODULE_DEFAULTS
from .patches import deblur_patches
from .pipeline import polyblur_core
from .utils.imaging import to_tensor, to_array

__all__ = ["polyblur_deblurring", "PolyblurDeblurring"]

#: Above this edge length, ``method='auto'`` engages the overlapping-patch
#: engine on TPU (whole images past the mega-kernel envelope would
#: otherwise run the slower blocked route, and per-tile estimation is the
#: reference's own large-image mode, deblurring.py:269-340).
_AUTO_TILE_EDGE = 700


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
    (identical math to the fused scan — same estimation and deconvolution
    calls) with a forced device sync after each stage so the deltas are
    real device times, not dispatch times.
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
    engine (the reference's large-image mode, deblurring.py:269-340; here
    on the TPU-efficient 576px/step-512 grid) for images larger than
    ~700px. NOTE the
    semantics change that comes with it, exactly as in the reference's
    patch mode: the blur is then estimated per tile, which doubles as
    spatially-varying-blur handling. Explicit ``method=`` values always
    run whole-image.

    ``verbose`` prints the reference's per-stage timing lines
    (deblurring.py:59-90) with forced device syncs between stages; the
    stage-split run is mathematically identical to the fused one.
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

    auto_tile = (method == "auto" and jax.default_backend() == "tpu"
                 and max(x.shape[-2:]) > _AUTO_TILE_EDGE)
    if auto_tile:
        from .utils.profiling import record_dispatch

        record_dispatch("polyblur_deblurring", "auto_tiled")
        # 576px tiles at step 512: the most efficient mega-kernel grid —
        # statically (8, 128)-aligned steps (no-de-offset DMA), 1.27x tile
        # redundancy (vs 1.78x at the reference-default 400/25%), 64px
        # seams >= 2x the 25-tap kernel support, and 576 fits the plain
        # mega VMEM envelope. Same ~40 dB whole-image-oracle agreement as
        # the reference-default grid.
        _ats, _ato = 576, 64.0 / 576.0
        if verbose:
            from .utils.profiling import stage_timer, force_execution

            with stage_timer("polyblur_deblurring (auto-tiled, incl. any "
                             "compile)"):
                out = deblur_patches(x, patch_size=_ats, overlap=_ato,
                                     batch_size=0, **cfg.traced_kwargs(),
                                     **cfg.static_kwargs())
                force_execution(out)
        else:
            out = deblur_patches(x, patch_size=_ats, overlap=_ato,
                                 batch_size=0, **cfg.traced_kwargs(),
                                 **cfg.static_kwargs())
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
