"""xDeepFM: CIN layer + full model.

Parity: ref deep_recommenders/keras/models/ranking/xdeepfm.py:8-116. The
reference's split/outer/conv1d choreography is reformulated as tensor
contractions (see ops/cin.py). Error contracts preserved: inputs must be a
(x0, x) pair of 3-D tensors (ref xdeepfm.py:41-48, :75-80).

Round-5 performance (v5e chip, zoo config B=8192, D=16, F0=6, maps
128/128, value-fenced tools/trace_timing): full train step
4,891 us (r4, layered cin2d == einsum) -> ~1,466 us with the fused
2-layer stack kernel (ops/cin_kernels.cin_stack_pooled) + bf16 row
stream. Device-time composition at that point: stack backward ~723 us,
stack forward ~242 us, the (B,F,D)->(B*D,F) transpose fusions ~215 us
(bandwidth floor of the lane-padded row layout at bf16), embedding
scatter + optimizer + MLP ~290 us. The backward's 51.6 GFLOP of
irreducible layer-2 contractions bound the kernel at ~450 us even at
100% MFU, so ~1.1 ms is this formulation's floor at these shapes;
ZOO_r05.json carries the committed measurement.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deep_recommenders_tpu.embedding.engine import (
    EmbeddingCollection,
    LinearTerms,
)
from deep_recommenders_tpu.features.columns import Feature
from deep_recommenders_tpu.models.common import MLP, resolve_activation
from deep_recommenders_tpu.ops.cin import cin_interaction
from deep_recommenders_tpu.ops.cin_kernels import cin_interaction_fused


class CIN(nn.Module):
    """One compressed-interaction layer: (x0, x) -> (B, feature_map, D)."""

    feature_map: int = 3
    use_bias: bool = False
    activation: str = "sigmoid"
    fused: bool = True  # Pallas kernel on TPU; einsum fallback elsewhere

    @nn.compact
    def __call__(self, inputs: Tuple[jax.Array, jax.Array]) -> jax.Array:
        if not isinstance(inputs, (tuple, list)):
            raise ValueError(
                f"`CIN` inputs must be a (x0, x) tuple, got {type(inputs)}"
            )
        if len(inputs) != 2:
            raise ValueError(
                f"`CIN` inputs tuple length should be 2, got {len(inputs)}"
            )
        x0, x = inputs
        rows_mode = x0.ndim == 2 and x.ndim == 2
        if not rows_mode and (x0.ndim != 3 or x.ndim != 3):
            raise ValueError(
                f"`x0` and `x` must be 3-D, got {x0.ndim} / {x.ndim}"
            )
        f0, f = x0.shape[1], x.shape[1]
        kernel = self.param(
            "kernel",
            nn.initializers.truncated_normal(stddev=0.05),
            (f0, f, self.feature_map),
        )
        if rows_mode:
            # Flattened (B*D, F) rows end-to-end: the minor dim stays the
            # feature-map width (hardware-sized lanes) instead of the
            # narrow embedding dim whose 8x lane padding dominates the 3-D
            # path. Used by XDeepFM's stack; fused kernel on TPU.
            from deep_recommenders_tpu.ops.cin_kernels import cin2d

            out = (
                cin2d(x0, x, kernel)
                if self.fused
                else jnp.einsum(
                    "rf,rg,fgm->rm", x0, x, kernel, optimize=True
                )
            )  # (R, M)
            if self.use_bias:
                bias = self.param(
                    "bias", nn.initializers.zeros, (self.feature_map,)
                )
                out = out + bias[None, :]
            act = resolve_activation(self.activation)
            return act(out) if act is not None else out
        # Fused Pallas path on TPU (ops/cin_kernels.py: flattened-row MXU
        # kernel, no giant einsum intermediates); einsum elsewhere.
        if self.fused:
            out = cin_interaction_fused(x0, x, kernel)  # (B, M, D)
        else:
            out = cin_interaction(x0, x, kernel)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.feature_map,)
            )
            out = out + bias[None, :, None]
        act = resolve_activation(self.activation)
        return act(out) if act is not None else out


class XDeepFM(nn.Module):
    """Full xDeepFM: linear + CIN stack (sum-pooled) + deep MLP -> logits."""

    specs: Tuple[Feature, ...]
    embedding_dim: int = 16
    cin_feature_maps: Tuple[int, ...] = (128, 128)
    cin_activation: str = "relu"
    hidden: Tuple[int, ...] = (256, 128)
    # Optional jax.sharding.Mesh: embedding table through the shard_map
    # exchange; the scalar LinearTerms table stays replicated (tiny).
    mesh: object = None
    # Mixed precision (bf16 compute, fp32 params/logits) — see DeepFM. The
    # CIN stack computes in bf16 with fp32 accumulation internally and its
    # input stream is bf16 regardless of this setting.
    compute_dtype: object = None

    def _use_fused_stack(self) -> bool:
        # The whole-stack fused kernel (ops/cin_kernels.cin_stack_pooled)
        # covers the reference's flagship configuration: exactly two CIN
        # layers with relu activation (ref xdeepfm.py:101-106 defaults).
        # Other depths/activations keep the generic layered path.
        return (
            len(self.cin_feature_maps) == 2
            and self.cin_activation == "relu"
        )

    def setup(self):
        self.linear = LinearTerms(self.specs)
        self.embeddings = EmbeddingCollection(
            self.specs, self.embedding_dim, mesh=self.mesh,
            compute_dtype=self.compute_dtype,
        )
        if self._use_fused_stack():
            f0 = len(self.specs)
            m1, m2 = self.cin_feature_maps
            init = nn.initializers.truncated_normal(stddev=0.05)
            self.cin_w1 = self.param("cin_w1", init, (f0, f0, m1))
            self.cin_w2 = self.param("cin_w2", init, (f0, m1, m2))
        else:
            self.cins = [
                CIN(feature_map=m, activation=self.cin_activation)
                for m in self.cin_feature_maps
            ]
        self.deep = MLP(self.hidden, output_dim=1, dtype=self.compute_dtype)
        self.cin_head = nn.Dense(1, use_bias=False, dtype=jnp.float32)

    def __call__(self, batch, training: bool = False) -> jax.Array:
        from deep_recommenders_tpu.ops.cin_kernels import cin_stack_pooled

        linear_logit = self.linear(batch)
        x0 = self.embeddings(batch)  # (B, F, D)
        b, f0, d = x0.shape
        # CIN stack in flattened (B*D, F) rows: one transpose in, per-layer
        # outputs stay lane-friendly (M wide), pooling reshapes at the end.
        x0v = x0.transpose(0, 2, 1).reshape(b * d, f0)
        if self._use_fused_stack():
            # bf16 input stream: the kernels compute in bf16 on the MXU
            # anyway, and the (R, F0) row tensor lane-pads 21x in HBM —
            # halving its bytes halves the transpose fusion and the
            # kernel DMA (measured round 5). Grad flows back bf16 and is
            # upcast by the cast's transpose before the embedding scatter.
            x0v = x0v.astype(jnp.bfloat16)
            # Both layers + relu + d-sum pooling fused in one kernel pass:
            # only the pooled (B, M) tensors touch HBM (cin_kernels.py).
            if self.mesh is not None:
                # The stack is batch-parallel; under a mesh, run it as an
                # explicit shard_map over "data" so GSPMD never treats the
                # Pallas call as an opaque unit to replicate (which would
                # all-gather the row tensor onto every chip). Weights are
                # replicated; per-shard rows stay whole examples because
                # the batch axis shards B, not B*d.
                from jax.sharding import PartitionSpec as P

                from deep_recommenders_tpu.parallel.sharding import (
                    DATA_AXIS,
                )

                p1, p2 = jax.shard_map(
                    lambda xv, w1, w2: cin_stack_pooled(xv, w1, w2, d),
                    mesh=self.mesh,
                    in_specs=(P(DATA_AXIS, None), P(), P()),
                    out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
                )(x0v, self.cin_w1, self.cin_w2)
            else:
                p1, p2 = cin_stack_pooled(
                    x0v, self.cin_w1, self.cin_w2, d
                )
            pooled = [p1, p2]
        else:
            x0v = x0v.astype(jnp.float32)
            xv, pooled = x0v, []
            for cin in self.cins:
                xv = cin((x0v, xv))  # (B*D, M)
                # sum over the embedding dim d
                pooled.append(xv.reshape(b, d, -1).sum(axis=1))  # (B, M)
        cin_logit = self.cin_head(jnp.concatenate(pooled, axis=-1))
        deep_logit = self.deep(x0.reshape(b, -1), training=training)
        return linear_logit + cin_logit + deep_logit.astype(jnp.float32)
