"""Central configuration pytree for the Polyblur pipeline.

The reference threads ~17 keyword arguments verbatim through every API level
with *inconsistent defaults* (functional b=0.768/beta=3 at deblurring.py:23
vs module b=0.468/beta=4 at deblurring.py:266 vs estimator b=0.464 at
blur_estimation.py:18 — see SURVEY.md §5.6). Here there is ONE config
dataclass; the pinned default set is the module-level one (it matches the
shipped demo, main.py:105-106), and every entry point accepts per-call
overrides.

Continuous fields (c, b, alpha, beta, sigma_s, sigma_r) are pytree *leaves*
so they can be traced and differentiated — the deblurrer can sit inside a
training loss with learnable pipeline parameters. Structural fields (n_iter,
method, flags...) are static metadata that select the compiled program.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax

__all__ = ["PolyblurConfig", "FUNCTIONAL_DEFAULTS", "MODULE_DEFAULTS"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PolyblurConfig:
    """All pipeline knobs in one pytree.

    Leaves (differentiable, traced under jit):
        c, b:            affine blur-model slope / intercept (Eq. 24)
        alpha, beta:     mid / high frequency gains of the degree-3 filter
        sigma_s, sigma_r: spatial / range scales of the edge-aware prefilter

    Static metadata (changes recompile):
        n_iter, ker_size, q, n_angles, n_interpolated_angles, and the
        boolean/str feature switches — same names as the reference surface
        (deblurring.py:23-25, :266-268).
    """

    # --- traced leaves ---
    c: Any = 0.352
    b: Any = 0.468
    alpha: Any = 2.0
    beta: Any = 4.0
    sigma_s: Any = 2.0
    sigma_r: Any = 0.4

    # --- static metadata ---
    n_iter: int = dataclasses.field(default=1, metadata={"static": True})
    ker_size: int = dataclasses.field(default=25, metadata={"static": True})
    q: float = dataclasses.field(default=0.0, metadata={"static": True})
    n_angles: int = dataclasses.field(default=6, metadata={"static": True})
    n_interpolated_angles: int = dataclasses.field(
        default=30, metadata={"static": True})
    remove_halo: bool = dataclasses.field(default=False, metadata={"static": True})
    edgetaping: bool = dataclasses.field(default=False, metadata={"static": True})
    prefiltering: bool = dataclasses.field(default=False, metadata={"static": True})
    discard_saturation: bool = dataclasses.field(
        default=False, metadata={"static": True})
    multichannel_kernel: bool = dataclasses.field(
        default=False, metadata={"static": True})
    method: str = dataclasses.field(default="fft", metadata={"static": True})
    smoother: str = dataclasses.field(default="bilateral", metadata={"static": True})
    remat: bool = dataclasses.field(default=False, metadata={"static": True})

    def replace(self, **kw) -> "PolyblurConfig":
        return dataclasses.replace(self, **kw)

    def static_kwargs(self) -> dict:
        """The static subset, keyed for :func:`pipeline.polyblur_core`."""
        return {
            f.name: getattr(self, f.name)
            for f in dataclasses.fields(self)
            if f.metadata.get("static")
        }

    def traced_kwargs(self) -> dict:
        return {
            f.name: getattr(self, f.name)
            for f in dataclasses.fields(self)
            if not f.metadata.get("static")
        }


#: Defaults of the reference *functional* API (deblurring.py:23-25).
FUNCTIONAL_DEFAULTS = PolyblurConfig(b=0.768, beta=3.0, sigma_r=0.8)

#: Defaults of the reference *module* API (deblurring.py:266-268) — the
#: pinned framework-wide default set.
MODULE_DEFAULTS = PolyblurConfig()
