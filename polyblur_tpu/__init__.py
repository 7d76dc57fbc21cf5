"""polyblur_tpu — a TPU-native (JAX/XLA/Pallas) blind image-deblurring framework.

Re-implements the full capability surface of the reference Polyblur library
(/root/reference, teboli/polyblur: Delbracio et al., "Polyblur: Removing mild
blur by polynomial reblurring", IEEE TCI 2021) as an idiomatic JAX framework:
the N-iteration blind deblurring loop compiles through ``jax.jit`` with
``lax.scan``, batching via ``vmap``, native-extension equivalents as Pallas
TPU kernels, and multi-chip scale-out via sharded image tiles.

Public API (mirrors /root/reference/polyblur/__init__.py:1):
    ``polyblur_deblurring`` — functional entry point
    ``PolyblurDeblurring``  — stateless callable layer with patch engine
"""

from .api import polyblur_deblurring, PolyblurDeblurring
from .config import PolyblurConfig
from .ops.pallas.sep_poly_fused import (set_f32_dot_mode, f32_dot_mode,
                                        f32_dot_mode_scope)

__version__ = "0.1.0"

__all__ = ["polyblur_deblurring", "PolyblurDeblurring", "PolyblurConfig",
           "set_f32_dot_mode", "f32_dot_mode", "f32_dot_mode_scope"]
