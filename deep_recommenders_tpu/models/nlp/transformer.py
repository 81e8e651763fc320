"""Transformer encoder-decoder + Noam schedule.

Parity: ref deep_recommenders/keras/models/nlp/transformer.py —
- sinusoidal position encodings (ref :12-31) — computed with jnp at trace
  time from the static sequence length (the reference recomputes them in
  numpy on every call).
- position-wise FFN (ref :48-88), LayerNorm (ref :91-116; flax LayerNorm
  here), residual + post-norm wiring per layer.
- full encoder-decoder in one module (ref :119-287): token embedding SHARED
  between input embedding and the tied pre-softmax projection (ref :142-146,
  :263-265); decoder self-attention causal (ref :165-168); padding mask =
  (tokens == 0) (ref :195, :228).
- Noam LR schedule d^-0.5 * min(step^-0.5, step * warmup^-1.5) (ref
  :290-317) as an optax schedule instead of a Keras callback.
- label smoothing lives in training/losses.label_smoothing (ref :320-324).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deep_recommenders_tpu.models.nlp.attention import (
    MultiHeadAttention,
    TokenEmbedding,
)


def position_encoding(seq_len: int, dim: int) -> jax.Array:
    """Sinusoidal encodings (ref transformer.py:19-28), shape (seq_len, dim)."""
    pos = jnp.arange(seq_len, dtype=jnp.float32)[:, None]
    i = jnp.arange(dim, dtype=jnp.float32)[None, :]
    angle = pos / jnp.power(10000.0, (2.0 * jnp.floor(i / 2.0)) / dim)
    even = jnp.sin(angle)
    odd = jnp.cos(angle)
    return jnp.where(jnp.arange(dim)[None, :] % 2 == 0, even, odd)


class PositionWiseFeedForward(nn.Module):
    model_dim: int
    inner_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = jax.nn.relu(
            nn.Dense(self.inner_dim, dtype=self.dtype, name="inner")(x)
        )
        return nn.Dense(self.model_dim, dtype=self.dtype, name="outer")(h)


class EncoderLayer(nn.Module):
    num_heads: int
    model_dim: int
    ffn_dim: int
    dropout: float = 0.0
    # Compute dtype for attention + FFN matmuls; LayerNorm statistics and
    # the residual stream stay fp32 (post-norm wiring: LN output is the
    # stream, so fp32 LN keeps the stream fp32 at every layer boundary).
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, key_mask, training: bool = False):
        attn = MultiHeadAttention(
            self.num_heads, self.model_dim, dropout=self.dropout,
            dtype=self.dtype, name="self_attention",
        )(x, x, x, key_mask=key_mask, training=training)
        x = nn.LayerNorm(dtype=jnp.float32, name="attn_norm")(x + attn)
        ffn = PositionWiseFeedForward(
            self.model_dim, self.ffn_dim, dtype=self.dtype, name="ffn"
        )(x)
        return nn.LayerNorm(dtype=jnp.float32, name="ffn_norm")(x + ffn)


class DecoderLayer(nn.Module):
    num_heads: int
    model_dim: int
    ffn_dim: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x, memory, self_mask, memory_mask, training: bool = False
    ):
        self_attn = MultiHeadAttention(
            self.num_heads, self.model_dim, dropout=self.dropout,
            causal=True, dtype=self.dtype, name="self_attention",
        )(x, x, x, key_mask=self_mask, training=training)
        x = nn.LayerNorm(dtype=jnp.float32, name="self_norm")(x + self_attn)
        cross = MultiHeadAttention(
            self.num_heads, self.model_dim, dropout=self.dropout,
            dtype=self.dtype, name="cross_attention",
        )(x, memory, memory, key_mask=memory_mask, training=training)
        x = nn.LayerNorm(dtype=jnp.float32, name="cross_norm")(x + cross)
        ffn = PositionWiseFeedForward(
            self.model_dim, self.ffn_dim, dtype=self.dtype, name="ffn"
        )(x)
        return nn.LayerNorm(dtype=jnp.float32, name="ffn_norm")(x + ffn)


class Transformer(nn.Module):
    """Encoder-decoder over token ids; 0 is the padding token.

    Returns decoder logits over the vocab via the tied embedding projection.
    ``encode``/``decode`` are exposed for encoder-only use (the IMDB example
    pools encoder outputs).
    """

    vocab_size: int
    model_dim: int = 512
    num_heads: int = 8
    num_encoder_layers: int = 2
    num_decoder_layers: int = 2
    ffn_dim: int = 2048
    dropout: float = 0.1
    # Mixed precision: bfloat16 runs every matmul (projections, attention,
    # FFN, tied vocab projection) on the MXU in bf16; params, LayerNorm
    # statistics, the residual stream, and the returned logits stay fp32.
    compute_dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.embedding = TokenEmbedding(
            self.vocab_size, self.model_dim, dtype=self.compute_dtype,
            name="token_embedding",
        )
        self.encoder_layers = [
            EncoderLayer(
                self.num_heads, self.model_dim, self.ffn_dim, self.dropout,
                dtype=self.compute_dtype, name=f"encoder_{i}",
            )
            for i in range(self.num_encoder_layers)
        ]
        self.decoder_layers = [
            DecoderLayer(
                self.num_heads, self.model_dim, self.ffn_dim, self.dropout,
                dtype=self.compute_dtype, name=f"decoder_{i}",
            )
            for i in range(self.num_decoder_layers)
        ]

    def _embed(self, tokens):
        x = self.embedding(tokens)
        pe = position_encoding(tokens.shape[1], self.model_dim)
        return x + pe[None].astype(x.dtype)

    def encode(self, tokens, training: bool = False):
        """tokens: (B, S) int ids -> (B, S, D) encoder memory."""
        mask = (tokens != 0).astype(jnp.float32)
        x = self._embed(tokens)
        for layer in self.encoder_layers:
            x = layer(x, mask, training=training)
        return x, mask

    def decode(self, tokens, memory, memory_mask, training: bool = False):
        mask = (tokens != 0).astype(jnp.float32)
        x = self._embed(tokens)
        for layer in self.decoder_layers:
            x = layer(x, memory, mask, memory_mask, training=training)
        return x

    def __call__(self, inputs, targets, training: bool = False):
        memory, memory_mask = self.encode(inputs, training=training)
        out = self.decode(targets, memory, memory_mask, training=training)
        return self.embedding.attend(out)  # (B, St, vocab) logits

    def loss(
        self,
        inputs,
        targets_in,
        targets_out,
        epsilon: float = 0.0,
        training: bool = True,
        mask=None,
    ):
        """Fused training loss: tied vocab projection + smoothed sparse CE
        without ever keeping the (B, S, V) logits as residuals.

        ``__call__`` + a loss on its logits saves the fp32 (B, S, V)
        tensor for backward — measured round 5 at ~5.3 ms/step of HBM
        traffic at the zoo config, dwarfing the attention stack. Use this
        method for training (``model.apply(p, ..., method=Transformer.loss)``)
        and ``__call__`` for eval/serving logits.
        """
        from deep_recommenders_tpu.training.losses import (
            tied_smoothed_sparse_softmax_cross_entropy,
        )

        memory, memory_mask = self.encode(inputs, training=training)
        out = self.decode(targets_in, memory, memory_mask, training=training)
        table = self.embedding.get_variable("params", "table")
        if self.compute_dtype is not None:
            table = table.astype(self.compute_dtype)
            out = out.astype(self.compute_dtype)
        return tied_smoothed_sparse_softmax_cross_entropy(
            out, table, targets_out, epsilon=epsilon, mask=mask
        )


def noam_schedule(model_dim: int, warmup_steps: int = 4000):
    """Noam LR (ref transformer.py:299-308) as an optax schedule."""

    def schedule(step):
        step = jnp.maximum(step.astype(jnp.float32), 1.0)
        return model_dim**-0.5 * jnp.minimum(
            step**-0.5, step * warmup_steps**-1.5
        )

    return schedule
