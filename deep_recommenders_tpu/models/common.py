"""Shared model building blocks: MLP tower, activation resolution.

Replaces the reference's ``dnn()`` primitive
(ref deep_recommenders/estimator/models/feature_interaction/dnn.py:9-31).
Note the reference's batch-norm path is dead code — it calls
``tf.nn.batch_normalization(x)`` without the required moment args and crashes
when enabled (ref dnn.py:24, SURVEY §fidelity). Here BatchNorm is a working
flax BatchNorm with proper running statistics.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

Activation = Union[str, Callable[[jax.Array], jax.Array], None]


def resolve_activation(act: Activation) -> Optional[Callable]:
    if act is None:
        return None
    if callable(act):
        return act
    table = {
        "relu": jax.nn.relu,
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
        "gelu": jax.nn.gelu,
        "softmax": jax.nn.softmax,
        "linear": None,
        "none": None,
    }
    if act not in table:
        raise ValueError(f"Unknown activation {act!r}")
    return table[act]


class MLP(nn.Module):
    """Hidden layers with activation (+ optional BN / dropout), then a final
    linear layer of ``output_dim`` units (omitted when output_dim is None).

    ``dtype`` is the COMPUTE dtype (mixed precision): params are always
    stored fp32; with dtype=bfloat16 the matmuls run on the MXU in bf16 and
    the output is cast back to fp32 at the caller's loss boundary. BatchNorm
    statistics stay fp32 regardless (flax keeps reductions in fp32 via
    param_dtype and we pin its dtype to fp32 for numerical safety).
    """

    hidden: Sequence[int]
    output_dim: Optional[int] = 1
    activation: Activation = "relu"
    batch_norm: bool = False
    dropout: Optional[float] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        act = resolve_activation(self.activation)
        for units in self.hidden:
            x = nn.Dense(units, dtype=self.dtype)(x)
            if act is not None:
                x = act(x)
            if self.batch_norm:
                x = nn.BatchNorm(
                    use_running_average=not training, dtype=jnp.float32
                )(x)
            if self.dropout:
                x = nn.Dropout(self.dropout, deterministic=not training)(x)
        if self.output_dim is not None:
            x = nn.Dense(self.output_dim, dtype=self.dtype)(x)
        return x
