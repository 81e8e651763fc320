"""Deep Interest Network: ActivationUnit scorer, Dice activation, DIN model.

Parity: ref deep_recommenders/keras/models/ranking/din.py —
- ActivationUnit: concat [x, y, interacter(x, y)] -> Dense(units, act) ->
  Dense(1) attention score (ref din.py:59-71); ``interacter`` is pluggable
  (the canonical choice is elementwise subtract).
- Dice: data-adaptive activation blending PReLU branches by
  p = sigmoid(standardized x) (ref din.py:110-121; we use the paper's
  variance normalization — see ops/dice.py for the documented divergence).

The reference ships only the layers; ``DIN`` here is the full model: the
ActivationUnit scores every position of the user-behavior sequence against
the candidate (batched over time via one reshape — no Python loop over
positions), scores are masked-softmaxed and pool the sequence.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deep_recommenders_tpu.models.common import resolve_activation
from deep_recommenders_tpu.ops.dice import dice


class Dice(nn.Module):
    """Dice activation with learnable PReLU slope."""

    epsilon: float = 1e-8

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param(
            "alpha", nn.initializers.zeros, (x.shape[-1],)
        )
        return dice(x, alpha, epsilon=self.epsilon)


class ActivationUnit(nn.Module):
    """Attention scorer between two embeddings -> (B, 1) score."""

    units: int
    interacter: Optional[Callable[[jax.Array, jax.Array], jax.Array]] = None
    use_bias: bool = True
    activation: str = "relu"

    @nn.compact
    def __call__(
        self, x_embeddings: jax.Array, y_embeddings: Optional[jax.Array] = None
    ) -> jax.Array:
        if y_embeddings is None:
            y_embeddings = x_embeddings
        parts = [x_embeddings, y_embeddings]
        if self.interacter is not None:
            parts.append(self.interacter(x_embeddings, y_embeddings))
        x = jnp.concatenate(parts, axis=-1)
        act = resolve_activation(self.activation)
        x = nn.Dense(
            self.units,
            use_bias=self.use_bias,
            kernel_init=nn.initializers.truncated_normal(stddev=0.05),
            name="dense_kernel",
        )(x)
        if act is not None:
            x = act(x)
        return nn.Dense(
            1,
            use_bias=self.use_bias,
            kernel_init=nn.initializers.truncated_normal(stddev=0.05),
            name="dense_output",
        )(x)


def subtract_interacter(x: jax.Array, y: jax.Array) -> jax.Array:
    """The canonical DIN interacter (keras Subtract equivalent)."""
    return x - y


class DIN(nn.Module):
    """Full DIN head over a user-behavior sequence.

    Inputs: behavior sequence embeddings (B, T, D) + mask (B, T), candidate
    embedding (B, D), optional extra context features (B, C). Output: (B, 1)
    logits.

    With ``num_items`` set, DIN owns the item-embedding table and the
    behaviors/candidate inputs are INT IDS ((B, T) / (B,)) instead of
    vectors. That table is the model's one large parameter; ``mesh`` routes
    its lookups through the explicit row-sharded shard_map exchange
    (embedding/sharded.sharded_lookup: resident-rows gather + one psum over
    "model"), the same tensor-parallel pattern as the rest of the zoo.
    """

    attention_units: int = 36
    hidden: Tuple[int, ...] = (200, 80)
    use_dice: bool = True
    # Optional owned item-embedding table (ids-in mode):
    num_items: Optional[int] = None
    embedding_dim: int = 16
    # Optional jax.sharding.Mesh — requires num_items (the table is what
    # gets sharded).
    mesh: object = None

    def _embed_items(self, behaviors: jax.Array, candidate: jax.Array):
        from deep_recommenders_tpu.parallel.sharding import (
            MODEL_AXIS,
            with_sharding,
        )
        from jax.sharding import PartitionSpec as P

        n = self.num_items
        if self.mesh is not None:
            n_model = self.mesh.shape.get("model", 1)
            n = -(-n // n_model) * n_model  # pad rows to equal shards
        table = self.param(
            "item_table",
            nn.initializers.normal(stddev=1.0 / jnp.sqrt(self.embedding_dim)),
            (n, self.embedding_dim),
        )
        if self.mesh is not None:
            from deep_recommenders_tpu.embedding.sharded import sharded_lookup

            return (
                sharded_lookup(table, behaviors, self.mesh),
                sharded_lookup(table, candidate, self.mesh),
            )
        table = with_sharding(table, P(MODEL_AXIS, None))
        return (
            jnp.take(table, behaviors, axis=0),
            jnp.take(table, candidate, axis=0),
        )

    @nn.compact
    def __call__(
        self,
        behaviors: jax.Array,
        behavior_mask: jax.Array,
        candidate: jax.Array,
        context: Optional[jax.Array] = None,
        training: bool = False,
    ) -> jax.Array:
        if self.mesh is not None and self.num_items is None:
            raise ValueError("DIN(mesh=...) requires num_items (the sharded "
                             "item table is what the mesh partitions)")
        if self.num_items is not None:
            behaviors, candidate = self._embed_items(behaviors, candidate)
        b, t, d = behaviors.shape
        # Score every (position, candidate) pair in one batched pass.
        unit = ActivationUnit(
            self.attention_units, interacter=subtract_interacter
        )
        cand_tiled = jnp.broadcast_to(candidate[:, None, :], (b, t, d))
        scores = unit(
            behaviors.reshape(b * t, d), cand_tiled.reshape(b * t, d)
        ).reshape(b, t)
        scores = jnp.where(behavior_mask > 0, scores, -1e9)
        weights = jax.nn.softmax(scores, axis=-1)
        interest = jnp.einsum("bt,btd->bd", weights, behaviors)
        parts = [interest, candidate, interest * candidate]
        if context is not None:
            parts.append(context)
        x = jnp.concatenate(parts, axis=-1)
        # Hand-rolled tower: Dice owns per-layer params, so it cannot be
        # passed into the shared MLP as a plain activation callable.
        for units in self.hidden:
            x = nn.Dense(units)(x)
            x = Dice()(x) if self.use_dice else jax.nn.relu(x)
        return nn.Dense(1)(x)
