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


def _run(img: jnp.ndarray, cfg: PolyblurConfig) -> jnp.ndarray:
    return polyblur_core(img, **cfg.traced_kwargs(), **cfg.static_kwargs())


def _adapt_in(img):
    """numpy (H,W)/(H,W,C) -> ((1,C,H,W) jax array, was_numpy flag)."""
    if isinstance(img, np.ndarray):
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
                        multichannel_kernel: bool = False, method: str = "fft",
                        verbose: bool = False):
    """Blind deblurring of mildly blurred image(s) — functional Polyblur.

    Same 17-kwarg surface and defaults as the reference functional API
    (deblurring.py:23-96). ``img`` is a numpy ``(H, W)``/``(H, W, C)`` image
    or a ``(B, C, H, W)`` array in [0, 1]; the return type matches the input.

    ``verbose`` wall-clocks the whole (fused) call; per-stage wall-times
    are meaningless inside one XLA program — use ``jax.profiler`` traces
    (utils/profiling.py) for per-op timing.
    """
    cfg = FUNCTIONAL_DEFAULTS.replace(
        n_iter=n_iter, c=c, b=b, alpha=alpha, beta=beta, sigma_r=sigma_r,
        sigma_s=sigma_s, ker_size=ker_size, q=q, n_angles=n_angles,
        n_interpolated_angles=n_interpolated_angles, remove_halo=remove_halo,
        edgetaping=edgetaping, prefiltering=prefiltering,
        discard_saturation=discard_saturation,
        multichannel_kernel=multichannel_kernel, method=method)
    x, was_numpy = _adapt_in(img)
    if verbose:
        from .utils.profiling import stage_timer, force_execution

        with stage_timer("polyblur_deblurring (incl. any compile)"):
            out = _run(x, cfg)
            force_execution(out)
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
                 multichannel_kernel: bool = False, method: str = "fft",
                 device: Optional[object] = None):
        del device
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
