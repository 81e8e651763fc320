"""Graph Convolutional Network layer + node-classification model.

Parity: ref deep_recommenders/keras/models/retrieval/gcn.py:6-68 — one layer
is act(A @ X @ W) with optional bias and residual connection; spectral
normalization of A lives in the dataset (datasets/cora.normalize_adjacency),
not the layer.

TPU-first: at Cora scale the adjacency is DENSE (2708^2 fp32 = 28 MB fits
HBM trivially) so both matmuls run on the MXU. For graphs whose dense
adjacency does not fit (O(N^2) HBM), pass an ``ops.sparse.SparseAdjacency``
— the A @ X product then runs as a static-shape COO gather + segment-sum
(the reference's tf.SparseTensor branch, ref gcn.py:43-50; crossover
measurement in ops/sparse.py). Contraction order (A @ X) @ W vs
A @ (X @ W) is chosen by feature widths: compute X @ W first when it
shrinks the columns.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deep_recommenders_tpu.models.common import Activation, resolve_activation


class GCNLayer(nn.Module):
    units: int
    activation: Activation = "relu"
    use_bias: bool = True
    use_residual: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, adjacency: jax.Array) -> jax.Array:
        w = self.param(
            "kernel",
            nn.initializers.glorot_uniform(),
            (x.shape[-1], self.units),
        )
        if self.units <= x.shape[-1]:
            out = adjacency @ (x @ w)
        else:
            out = (adjacency @ x) @ w
        if self.use_bias:
            out = out + self.param(
                "bias", nn.initializers.zeros, (self.units,)
            )
        act = resolve_activation(self.activation)
        if act is not None:
            out = act(out)
        if self.use_residual:
            if x.shape[-1] != self.units:
                raise ValueError(
                    "residual requires matching dims, got "
                    f"{x.shape[-1]} -> {self.units}"
                )
            out = out + x
        return out


class GCN(nn.Module):
    """Stacked GCN for node classification (the reference example's 2-layer
    config, ref examples/train_gcn_on_cora_keras.py)."""

    hidden: Tuple[int, ...] = (16,)
    num_classes: int = 7
    dropout: Optional[float] = 0.5

    @nn.compact
    def __call__(
        self, x: jax.Array, adjacency: jax.Array, training: bool = False
    ) -> jax.Array:
        for units in self.hidden:
            x = GCNLayer(units, activation="relu")(x, adjacency)
            if self.dropout:
                x = nn.Dropout(self.dropout, deterministic=not training)(x)
        # Final layer emits logits; softmax left to the loss.
        return GCNLayer(self.num_classes, activation=None)(x, adjacency)
