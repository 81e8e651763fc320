"""Token embedding + multi-head attention.

Parity: ref deep_recommenders/keras/models/nlp/multi_head_attention.py —
- ``TokenEmbedding``: lookup scaled by sqrt(d) (ref :8-32).
- ``MultiHeadAttention``: separate Q/K/V projections + output merge
  (ref :92-152). The reference implements heads by splitting along the
  embedding axis and CONCATENATING ALONG THE BATCH AXIS (ref :134-136);
  TPU-first this is a reshape to (B, H, S, Dh) folded to (B*H, S, Dh) so all
  heads run as one batched kernel invocation — same math, MXU-friendly
  layout. The score path goes through ops/attention.attention (Pallas flash
  kernel on TPU, jnp SDPA elsewhere).

Dropout follows the reference exactly: applied to the softmax WEIGHTS
(ref :83) inside the dense SDPA path. The flash kernel never materializes
the weight matrix, so ops/attention.attention routes dropout-active steps
to the dense path (and raises if flash is forced with dropout on) — the
kernel choice can change performance, never semantics.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from deep_recommenders_tpu.ops.attention import attention


class TokenEmbedding(nn.Module):
    vocab_size: int
    dim: int
    # Compute dtype (mixed precision): table params stay fp32; lookups and
    # the tied projection run in this dtype when set.
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, token_ids: jax.Array) -> jax.Array:
        table = self.param(
            "table",
            nn.initializers.normal(stddev=1.0),
            (self.vocab_size, self.dim),
        )
        if self.dtype is not None:
            table = table.astype(self.dtype)
        return jnp.take(table, token_ids, axis=0) * jnp.asarray(
            jnp.sqrt(jnp.float32(self.dim)), table.dtype
        )

    def attend(self, embeddings: jax.Array) -> jax.Array:
        """Tied pre-softmax projection: logits over the vocab using the same
        table (ref transformer.py:263-265 weight sharing). Returns fp32
        logits (the softmax/loss boundary must not round in bf16)."""
        table = self.get_variable("params", "table")
        if self.dtype is not None:
            table = table.astype(self.dtype)
            embeddings = embeddings.astype(self.dtype)
        return jnp.einsum(
            "...d,vd->...v", embeddings, table,
            preferred_element_type=jnp.float32,
        )


class MultiHeadAttention(nn.Module):
    num_heads: int
    model_dim: int
    dropout: float = 0.0
    causal: bool = False
    use_flash: Optional[bool] = None
    # Compute dtype for the Q/K/V/out projections and the attention kernel
    # (softmax statistics are always fp32 inside both attention paths).
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        queries: jax.Array,
        keys: jax.Array,
        values: jax.Array,
        key_mask: Optional[jax.Array] = None,
        training: bool = False,
    ) -> jax.Array:
        """queries: (B, Sq, D); keys/values: (B, Sk, D);
        key_mask: (B, Sk) with 1 = valid token."""
        if self.model_dim % self.num_heads != 0:
            raise ValueError(
                f"model_dim {self.model_dim} not divisible by "
                f"num_heads {self.num_heads}"
            )
        b, sq, _ = queries.shape
        sk = keys.shape[1]
        h, dh = self.num_heads, self.model_dim // self.num_heads

        def split_heads(x, s):
            return (
                x.reshape(b, s, h, dh)
                .transpose(0, 2, 1, 3)
                .reshape(b * h, s, dh)
            )

        q = split_heads(
            nn.Dense(self.model_dim, dtype=self.dtype, name="q_proj")(queries),
            sq,
        )
        k = split_heads(
            nn.Dense(self.model_dim, dtype=self.dtype, name="k_proj")(keys),
            sk,
        )
        v = split_heads(
            nn.Dense(self.model_dim, dtype=self.dtype, name="v_proj")(values),
            sk,
        )

        mask_bh = None
        if key_mask is not None:
            mask_bh = jnp.repeat(key_mask, h, axis=0)  # (B*H, Sk)

        # Reference semantics: dropout on the softmax WEIGHTS (ref :83).
        # The dispatch in ops/attention routes dropout-active steps to the
        # dense SDPA path (flash never materializes the weight matrix).
        drop_active = bool(self.dropout) and training
        out = attention(
            q, k, v, key_mask=mask_bh, causal=self.causal,
            use_flash=self.use_flash,
            dropout_rate=self.dropout if drop_active else 0.0,
            dropout_rng=self.make_rng("dropout") if drop_active else None,
        )
        out = (
            out.reshape(b, h, sq, dh)
            .transpose(0, 2, 1, 3)
            .reshape(b, sq, self.model_dim)
        )
        return nn.Dense(self.model_dim, dtype=self.dtype, name="out_proj")(out)
