"""Optimizers: FTRL-proximal + per-scope optimizer groups.

The reference WDL example trains the "wide" variable scope with
FTRL (+L1) and the "deep" scope with Adam
(ref examples/train_wdl_on_movielens_estimator.py:65-77). optax has no FTRL,
so ``ftrl`` implements the FTRL-Proximal update (McMahan et al. 2013) as a
GradientTransformation; ``scoped_optimizer`` reproduces per-scope optimizer
groups with optax.multi_transform keyed on param-tree paths.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax


class FtrlState(NamedTuple):
    z: Any
    n: Any


def ftrl(
    learning_rate: float = 0.1,
    learning_rate_power: float = -0.5,
    l1_regularization_strength: float = 0.0,
    l2_regularization_strength: float = 0.0,
    beta: float = 1.0,
) -> optax.GradientTransformation:
    """FTRL-Proximal. Mirrors tf.train.FtrlOptimizer's arg names/semantics."""
    if learning_rate_power != -0.5:
        raise NotImplementedError("Only learning_rate_power=-0.5 supported")
    lr = learning_rate
    l1 = l1_regularization_strength
    l2 = l2_regularization_strength

    def init_fn(params):
        return FtrlState(
            z=jax.tree.map(jnp.zeros_like, params),
            n=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("ftrl requires params")
        # Plain multi-pass tree maps (no is_leaf tricks): under
        # optax.multi_transform/masked, pruned leaves become MaskedNode —
        # an EMPTY pytree that tree.map must be allowed to skip.
        n_new = jax.tree.map(
            lambda n, g: n + jnp.square(g), state.n, grads
        )
        z_new = jax.tree.map(
            lambda z, g, n, nn, w: z + g - (jnp.sqrt(nn) - jnp.sqrt(n)) / lr * w,
            state.z, grads, state.n, n_new, params,
        )

        def _w_new(z, nn):
            denom = (beta + jnp.sqrt(nn)) / lr + l2
            return jnp.where(
                jnp.abs(z) <= l1,
                0.0,
                -(z - jnp.sign(z) * l1) / denom,
            )

        updates = jax.tree.map(
            lambda z, nn, w: _w_new(z, nn) - w, z_new, n_new, params
        )
        return updates, FtrlState(z=z_new, n=n_new)

    return optax.GradientTransformation(init_fn, update_fn)


def scoped_optimizer(
    scope_optimizers: Dict[str, optax.GradientTransformation],
    default: optax.GradientTransformation,
    params: Any,
) -> optax.GradientTransformation:
    """Route each param to the optimizer of the first scope found in its path.

    Reproduces the reference's per-variable-scope optimizer split (FTRL on
    "wide", Adam on "deep") via optax.multi_transform.
    """

    def _label(path, _):
        keys = [getattr(p, "key", str(p)) for p in path]
        joined = "/".join(str(k) for k in keys)
        for scope in scope_optimizers:
            if scope in joined:
                return scope
        return "__default__"

    labels = jax.tree_util.tree_map_with_path(_label, params)
    transforms = dict(scope_optimizers)
    transforms["__default__"] = default
    return optax.multi_transform(transforms, labels)
