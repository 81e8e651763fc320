"""Train a 2-layer GCN on Cora (full-batch node classification).

Mirrors ref examples/train_gcn_on_cora_keras.py: full-batch training with
boolean masks as sample weights (ref :38-48), test accuracy printed at the
end. Falls back to the synthetic citation graph without the cora files.
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

from deep_recommenders_tpu.datasets import Cora
from deep_recommenders_tpu.models.retrieval import GCN
from deep_recommenders_tpu.training.losses import softmax_cross_entropy


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datadir", default=None)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--hidden", type=int, default=16)
    p.add_argument("--learning-rate", type=float, default=0.01)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument(
        "--sparse-adjacency",
        action="store_true",
        help="use the static-COO segment-sum SpMM path (ops/sparse.py) "
        "instead of the dense MXU matmul — the form that scales past "
        "graphs whose dense adjacency fits HBM",
    )
    args = p.parse_args()

    cora = Cora(path=args.datadir, seed=args.seed)
    splits = cora.splits()
    x = jnp.asarray(cora.features)
    if args.sparse_adjacency:
        from deep_recommenders_tpu.ops.sparse import SparseAdjacency

        adj = SparseAdjacency.from_dense(cora.spectral_adjacency)
    else:
        adj = jnp.asarray(cora.spectral_adjacency)
    train_labels, train_mask = splits["train"]
    valid_labels, valid_mask = splits["valid"]
    test_labels, test_mask = splits["test"]

    model = GCN(
        hidden=(args.hidden,), num_classes=cora.num_classes, dropout=0.5
    )
    params = model.init(
        {"params": jax.random.PRNGKey(args.seed)}, x, adj
    )
    opt = optax.adam(args.learning_rate)
    opt_state = opt.init(params)
    labels = jnp.asarray(train_labels)
    mask = jnp.asarray(train_mask.astype(np.float32))

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            logits = model.apply(
                p, x, adj, training=True, rngs={"dropout": rng}
            )
            return softmax_cross_entropy(logits, labels, mask=mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def accuracy(params, mask):
        logits = model.apply(params, x, adj)
        pred = logits.argmax(-1)
        correct = (pred == jnp.asarray(cora.labels)) * mask
        return correct.sum() / mask.sum()

    rng = jax.random.PRNGKey(args.seed)
    for epoch in range(args.epochs):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, sub)
        if (epoch + 1) % 50 == 0:
            va = float(accuracy(params, jnp.asarray(valid_mask, jnp.float32)))
            print(f"epoch {epoch + 1}: loss {float(loss):.4f} valid acc {va:.4f}")

    ta = float(accuracy(params, jnp.asarray(test_mask, jnp.float32)))
    print(f"test accuracy: {ta:.4f}")


if __name__ == "__main__":
    main()
