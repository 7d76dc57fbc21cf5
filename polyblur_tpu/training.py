"""optax training loop for the differentiable deblurring layer.

The reference exposes Polyblur as a parameterless ``torch.nn.Module``
precisely so it can sit inside training graphs (reference
deblurring.py:250-268, README.md:69-80) — but ships no trainer. This module
is the TPU-native realisation of that use case: fit the pipeline scalars
(c, b, alpha, beta) of a learnable :class:`~polyblur_tpu.layers.PolyblurLayer`
end-to-end with optax, with the whole step jitted (and the scan body
rematerialised via ``remat=True`` so the backward pass stays memory-bounded
at megapixel sizes — the BASELINE "differentiable layer in a training loop"
config).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["make_train_step", "fit_layer", "save_params", "load_params",
           "save_checkpoint", "load_checkpoint"]


def save_params(params, path: str) -> None:
    """Persist a trained scalar-parameter pytree as JSON (the
    checkpoint/resume analog — the reference's module has an empty
    state_dict, so the only state worth persisting is the fitted pipeline
    scalars; structure round-trips exactly through :func:`load_params`)."""
    import json

    nested = jax.tree.map(float, params)
    with open(path, "w") as f:
        json.dump(nested, f, indent=1, sort_keys=True)


def load_params(path: str):
    """Inverse of :func:`save_params`; leaves come back as jnp.float32."""
    import json

    with open(path) as f:
        nested = json.load(f)
    return jax.tree.map(jnp.float32, nested)


def save_checkpoint(path: str, params, opt_state=None, step=None) -> None:
    """Full training-state checkpoint via orbax: params + optimizer state +
    step counter, in one atomic directory.

    :func:`save_params` stays the human-readable scalar snapshot; this is
    the resume-a-training-run form (optimizer moments are arrays JSON
    cannot hold faithfully) and is multi-host safe — orbax coordinates the
    write across `jax.distributed` processes.
    """
    import os

    import orbax.checkpoint as ocp

    state = {"params": params}
    if opt_state is not None:
        state["opt_state"] = opt_state
    if step is not None:
        state["step"] = jnp.int32(step)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, like):
    """Restore a :func:`save_checkpoint` directory.

    :param like: a pytree with the same structure (and array shapes/dtypes)
        as what was saved — e.g. ``{"params": params0, "opt_state":
        optimizer.init(params0), "step": jnp.int32(0)}``. Pass None to
        restore without a structure template (plain dicts/arrays).
    """
    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is None:
        return ckptr.restore(os.path.abspath(path))
    return ckptr.restore(os.path.abspath(path), like)


def _l2(out: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((out - target) ** 2)


def make_train_step(layer, optimizer,
                    loss_fn: Callable[[jnp.ndarray, jnp.ndarray],
                                      jnp.ndarray] = _l2):
    """One jitted optimizer step over a (blurry, sharp) pair.

    :param layer: a flax module (e.g. ``PolyblurLayer(learnable=True)``)
    :param optimizer: an ``optax.GradientTransformation``
    :returns: ``step(params, opt_state, blurry, sharp) ->
        (params, opt_state, loss)``
    """
    import optax

    @jax.jit
    def step(params, opt_state, blurry, sharp):
        def objective(p):
            return loss_fn(layer.apply(p, blurry), sharp)

        loss, grads = jax.value_and_grad(objective)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def fit_layer(layer, blurry: jnp.ndarray, sharp: jnp.ndarray,
              steps: int = 10, learning_rate: float = 1e-2,
              optimizer=None, rng: Optional[jax.Array] = None,
              loss_fn: Callable = _l2) -> Tuple[dict, list]:
    """Fit a learnable deblurring layer's scalars on one supervised pair.

    :param layer: ``PolyblurLayer(learnable=True, ...)``
    :param blurry: (B, C, H, W) degraded input
    :param sharp: (B, C, H, W) ground truth
    :returns: (trained params pytree, list of per-step float losses)
    """
    import optax

    if optimizer is None:
        optimizer = optax.adam(learning_rate)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    params = layer.init(rng, blurry)
    opt_state = optimizer.init(params)
    step = make_train_step(layer, optimizer, loss_fn)
    losses = []
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, blurry, sharp)
        losses.append(float(loss))
    return params, losses
