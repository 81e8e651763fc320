"""Deep & Cross Network: the Cross layer (DCN-v2) and a full DCN model.

Parity: ref deep_recommenders/keras/models/ranking/dcn.py:8-108 —
x_{l+1} = x0 * W(x_l) + x_l, with an optional low-rank factorization
W = V.U (projection_dim r, validated 0 < r <= d/2, ref dcn.py:48-53), and an
optional diag_scale stabilizer adding diag_scale * x to the projection
(ref dcn.py:85-86).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deep_recommenders_tpu.embedding.engine import EmbeddingCollection
from deep_recommenders_tpu.features.columns import Feature
from deep_recommenders_tpu.models.common import MLP


class Cross(nn.Module):
    """One cross layer: x0 * proj(x) + x."""

    projection_dim: Optional[int] = None
    diag_scale: float = 0.0
    use_bias: bool = True

    def __post_init__(self):
        super().__post_init__()
        if self.diag_scale < 0:
            raise ValueError(
                f"diag_scale must be non-negative, got {self.diag_scale}"
            )

    @nn.compact
    def __call__(
        self, x0: jax.Array, x: Optional[jax.Array] = None
    ) -> jax.Array:
        if x is None:
            x = x0
        if x0.shape[-1] != x.shape[-1]:
            raise ValueError(
                f"`x0` and `x` dim mismatch: {x0.shape[-1]} vs {x.shape[-1]}"
            )
        d = x0.shape[-1]
        init = nn.initializers.truncated_normal(stddev=0.05)
        if self.projection_dim is None:
            prod = nn.Dense(
                d, use_bias=self.use_bias, kernel_init=init, name="dense"
            )(x)
        else:
            if self.projection_dim < 0 or self.projection_dim > d // 2:
                raise ValueError(
                    "`projection_dim` should be positive and at most "
                    f"last_dim/2; got {self.projection_dim} for dim {d}"
                )
            u = nn.Dense(
                self.projection_dim, use_bias=False, kernel_init=init,
                name="dense_u",
            )(x)
            prod = nn.Dense(
                d, use_bias=self.use_bias, kernel_init=init, name="dense_v"
            )(u)
        if self.diag_scale:
            prod = prod + self.diag_scale * x
        return x0 * prod + x


class DCN(nn.Module):
    """Full DCN: embeddings -> stacked cross layers -> (parallel) MLP -> logit."""

    specs: Tuple[Feature, ...]
    embedding_dim: int = 16
    num_cross_layers: int = 3
    projection_dim: Optional[int] = None
    hidden: Tuple[int, ...] = (256, 128)
    structure: str = "stacked"  # "stacked" | "parallel"
    # Optional jax.sharding.Mesh: fused shard_map embedding exchange.
    mesh: object = None
    # Mixed precision (bf16 compute, fp32 params/logits) — see DeepFM.
    compute_dtype: object = None

    def setup(self):
        self.embeddings = EmbeddingCollection(
            self.specs, self.embedding_dim, mesh=self.mesh,
            compute_dtype=self.compute_dtype,
        )
        self.crosses = [
            Cross(projection_dim=self.projection_dim)
            for _ in range(self.num_cross_layers)
        ]
        self.deep = MLP(
            self.hidden, output_dim=None, dtype=self.compute_dtype
        )
        self.head = nn.Dense(1, dtype=jnp.float32)

    def __call__(self, batch, training: bool = False) -> jax.Array:
        stacked = self.embeddings(batch)
        b = stacked.shape[0]
        x0 = stacked.reshape(b, -1)
        x = x0
        for cross in self.crosses:
            x = cross(x0, x)
        if self.structure == "parallel":
            deep_out = self.deep(x0, training=training)
            x = jax.numpy.concatenate([x, deep_out], axis=-1)
        else:
            x = self.deep(x, training=training)
        return self.head(x)
