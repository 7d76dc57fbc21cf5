"""Neural-network layer wrappers for the differentiable deblurrer.

The reference exposes Polyblur as a parameterless ``torch.nn.Module`` so it
can sit inside training graphs (deblurring.py:250-268, README.md:69-80).
The JAX-native equivalents here:

* :class:`PolyblurLayer` — a ``flax.linen`` module. With
  ``learnable=True`` the pipeline scalars (c, b, alpha, beta) become flax
  parameters initialized at the calibrated defaults, so a training loop can
  fit the deblurring strength end-to-end (the BASELINE "differentiable
  layer in a training loop" config).
* :func:`polyblur_apply` — the bare pure function for haiku/optax-style
  code that does not want a module system.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

try:
    import flax.linen as nn

    _HAS_FLAX = True
except ImportError:  # pragma: no cover - flax is in the base image
    _HAS_FLAX = False

from .pipeline import polyblur_core

__all__ = ["PolyblurLayer", "polyblur_apply"]


def polyblur_apply(img: jnp.ndarray, c=0.362, b=0.468, alpha=2.0, beta=4.0,
                   **static_kwargs) -> jnp.ndarray:
    """Pure functional layer: differentiable w.r.t. ``img`` and all four
    scalars (clip/argmin have a.e.-defined gradients)."""
    return polyblur_core(img, c=c, b=b, alpha=alpha, beta=beta,
                         **static_kwargs)


if _HAS_FLAX:

    class PolyblurLayer(nn.Module):
        """flax.linen deblurring layer.

        :param n_iter: scanned Polyblur iterations
        :param learnable: expose (c, b, alpha, beta) as flax parameters
        :param method: 'fft' (exact) or 'direct_separable' (fast)
        :param remat: checkpoint the iteration body (large inputs)

        Example::

            layer = PolyblurLayer(n_iter=2, learnable=True)
            params = layer.init(rng, blurry)
            out = layer.apply(params, blurry)
        """

        n_iter: int = 3
        c: float = 0.362
        b: float = 0.468
        alpha: float = 6.0
        beta: float = 1.0
        learnable: bool = False
        method: str = "fft"
        remat: bool = False
        #: > 0 routes the forward through the overlapping-patch engine
        #: (deblur_patches) — the megapixel training configuration: tiles
        #: become the batch axis, remat bounds the backward pass per
        #: iteration, and gradients flow through the windowed overlap-add
        #: to the pipeline scalars (BASELINE config 5 at 12MP).
        patch_size: int = 0
        patch_overlap: float = 0.25
        extra: Any = None  # optional dict of further polyblur_core kwargs

        @nn.compact
        def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
            if self.learnable:
                c = self.param("c", lambda _: jnp.float32(self.c))
                b = self.param("b", lambda _: jnp.float32(self.b))
                alpha = self.param("alpha", lambda _: jnp.float32(self.alpha))
                beta = self.param("beta", lambda _: jnp.float32(self.beta))
            else:
                c, b, alpha, beta = self.c, self.b, self.alpha, self.beta
            kw = dict(self.extra or {})
            if self.patch_size > 0:
                from .patches import deblur_patches

                return deblur_patches(
                    img, patch_size=self.patch_size,
                    overlap=self.patch_overlap, n_iter=self.n_iter, c=c,
                    b=b, alpha=alpha, beta=beta, method=self.method,
                    remat=self.remat, **kw)
            return polyblur_core(img, n_iter=self.n_iter, c=c, b=b,
                                 alpha=alpha, beta=beta, method=self.method,
                                 remat=self.remat, **kw)

else:  # pragma: no cover

    class PolyblurLayer:  # type: ignore
        def __init__(self, *a, **k):
            raise ImportError("flax is required for PolyblurLayer")
