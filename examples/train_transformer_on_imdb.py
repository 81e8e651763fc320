"""Transformer encoder on IMDB-style binary sentiment classification.

Mirrors ref examples/train_transformer_on_imdb_keras.py:20-58: transformer
over token sequences, global average pool of the (encoder) outputs, 2-class
head, Noam learning-rate schedule. The reference feeds the SAME sequence to
encoder and decoder; encoder-only + pooling is the standard formulation for
classification and is used here.

No network in this environment: trains on datasets/imdb.SyntheticImdb by
default; pass --imdb-npz to use the real keras imdb.npz file.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from deep_recommenders_tpu.datasets.imdb import SyntheticImdb, load_imdb_npz
from deep_recommenders_tpu.models.nlp import Transformer, noam_schedule
from deep_recommenders_tpu.training.losses import softmax_cross_entropy


class TransformerClassifier(nn.Module):
    vocab_size: int
    model_dim: int = 64
    num_heads: int = 4
    num_layers: int = 2
    num_classes: int = 2
    # Mixed precision: bf16 matmuls, fp32 params/LN/logits (models/nlp).
    compute_dtype: object = None

    def setup(self):
        self.transformer = Transformer(
            vocab_size=self.vocab_size,
            model_dim=self.model_dim,
            num_heads=self.num_heads,
            num_encoder_layers=self.num_layers,
            num_decoder_layers=0,
            ffn_dim=self.model_dim * 4,
            dropout=0.0,
            compute_dtype=self.compute_dtype,
        )
        self.head = nn.Dense(self.num_classes)

    def __call__(self, tokens, training: bool = False):
        memory, mask = self.transformer.encode(tokens, training=training)
        denom = jnp.maximum(mask.sum(-1, keepdims=True), 1.0)
        pooled = (memory * mask[..., None]).sum(1) / denom
        return self.head(pooled)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--imdb-npz", default=None)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--num-words", type=int, default=2000)
    p.add_argument("--max-len", type=int, default=128)
    p.add_argument("--model-dim", type=int, default=64)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument(
        "--bf16", action="store_true",
        help="bfloat16 compute (fp32 params/logits) for every matmul",
    )
    args = p.parse_args()

    if args.imdb_npz:
        train, test = load_imdb_npz(
            args.imdb_npz, args.num_words, args.max_len
        )

        def batches(split, epochs=1):
            x, y = train if split == "train" else test
            for e in range(epochs):
                idx = np.random.default_rng(args.seed + e).permutation(len(y))
                for s in range(len(y) // args.batch_size):
                    rows = idx[s * args.batch_size : (s + 1) * args.batch_size]
                    yield x[rows], y[rows]

    else:
        ds = SyntheticImdb(
            num_words=args.num_words, max_len=args.max_len, seed=args.seed
        )

        def batches(split, epochs=1):
            return ds.batches(split, args.batch_size, epochs, args.seed)

    model = TransformerClassifier(
        vocab_size=args.num_words, model_dim=args.model_dim,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
    )
    x0, _ = next(iter(batches("train")))
    params = model.init(jax.random.PRNGKey(args.seed), jnp.asarray(x0))
    opt = optax.adam(noam_schedule(args.model_dim, warmup_steps=400))
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply(p, x, training=True)
            return softmax_cross_entropy(logits, jax.nn.one_hot(y, 2))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_step(params, x, y):
        pred = model.apply(params, x).argmax(-1)
        return jnp.sum(pred == y), y.shape[0]

    t0 = time.perf_counter()
    step = 0
    for epoch in range(args.epochs):
        for x, y in batches("train"):
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(x), jnp.asarray(y)
            )
            step += 1
            if step % 50 == 0:
                print(f"step {step} loss {float(loss):.4f}")
        correct = total = 0
        for x, y in batches("test"):
            c, t = eval_step(params, jnp.asarray(x), jnp.asarray(y))
            correct += int(c)
            total += int(t)
        print(
            f"epoch {epoch}: test accuracy {correct / total:.4f} "
            f"({time.perf_counter() - t0:.0f}s elapsed)"
        )


if __name__ == "__main__":
    main()
