"""Measure the REFERENCE GCN and Transformer (TF/keras, CPU) on the shared
synthetic datasets, extending BASELINE.md beyond DeepFM.

Runs the reference's own classes from /root/reference (GCN layer, full
Transformer) on the exact arrays our examples train on
(deep_recommenders_tpu Cora / SyntheticImdb, seed 42), mirroring the
reference example configs:

- GCN: 2 layers (32 -> softmax), Adam(0.01), full-batch, masks as sample
  weights, 200 epochs + EarlyStopping(3)
  (ref examples/train_gcn_on_cora_keras.py).
- Transformer: dim 8, 2 heads, 2+2 stacks, ff 50, encoder+decoder fed the
  same inputs, GlobalAvgPool -> 2-class softmax, Adam(b2=0.98, eps=1e-9),
  batch 128, 10 epochs + EarlyStopping(3)
  (ref examples/train_transformer_on_imdb_keras.py).

Compatibility shims (TF 2.21 / Keras 3, documented): a stub `faiss` module
(the retrieval package imports it at module scope; GCN never calls it).

Usage: python benchmarks/reference_gcn_transformer.py {gcn,transformer}
Prints one JSON line per run.
"""

from __future__ import annotations

import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.modules.setdefault("faiss", types.ModuleType("faiss"))
sys.path.insert(0, "/root/reference")

import numpy as np


def run_gcn():
    import tensorflow as tf

    from deep_recommenders.keras.models.retrieval import GCN
    from deep_recommenders_tpu.datasets import Cora

    cora = Cora(seed=42)
    splits = cora.splits()
    features = cora.features.astype(np.float32)
    graph = cora.spectral_adjacency.astype(np.float32)

    g_in = tf.keras.layers.Input(shape=(graph.shape[0],))
    f_in = tf.keras.layers.Input(shape=(features.shape[-1],))
    x = GCN(32)(f_in, g_in)
    out = GCN(cora.num_classes, activation="softmax")(x, g_in)
    model = tf.keras.Model([g_in, f_in], out)
    model.compile(
        optimizer=tf.keras.optimizers.Adam(0.01),
        loss="categorical_crossentropy",
        weighted_metrics=["acc"],
    )
    train_labels, train_mask = splits["train"]
    valid_labels, valid_mask = splits["valid"]
    test_labels, test_mask = splits["test"]
    n = graph.shape[0]
    t0 = time.perf_counter()
    hist = model.fit(
        [graph, features],
        train_labels,
        sample_weight=train_mask.astype(np.float32),
        validation_data=(
            [graph, features],
            valid_labels,
            valid_mask.astype(np.float32),
        ),
        batch_size=n,
        epochs=200,
        shuffle=False,
        verbose=0,
        callbacks=[tf.keras.callbacks.EarlyStopping(patience=3)],
    )
    elapsed = time.perf_counter() - t0
    loss, acc = model.evaluate(
        [graph, features],
        test_labels,
        sample_weight=test_mask.astype(np.float32),
        batch_size=n,
        verbose=0,
    )
    print(
        json.dumps(
            {
                "framework": "reference (TF, CPU)",
                "model": "GCN/Cora",
                "epochs_ran": len(hist.history["loss"]),
                "test_accuracy": round(float(acc), 4),
                "train_seconds": round(elapsed, 1),
            }
        )
    )


def run_transformer(epochs: int = 10):
    import tensorflow as tf

    from deep_recommenders.keras.models.nlp import Transformer
    from deep_recommenders_tpu.datasets import SyntheticImdb

    ds = SyntheticImdb(seed=42)
    (x_train, y_train), (x_test, y_test) = ds.train, ds.test
    y_train_1h = tf.keras.utils.to_categorical(y_train, 2)
    y_test_1h = tf.keras.utils.to_categorical(y_test, 2)
    max_len, vocab = ds.max_len, ds.num_words

    # Keras 3's functional tracing chokes on the reference layer's build;
    # a subclassed wrapper calls it with concrete tensors instead.
    class Classifier(tf.keras.Model):
        def __init__(self):
            super().__init__()
            self.transformer = Transformer(
                vocab, 8, n_heads=2, encoder_stack=2, decoder_stack=2,
                feed_forward_size=50,
            )
            self.pool = tf.keras.layers.GlobalAveragePooling1D()
            self.head = tf.keras.layers.Dense(2, activation="softmax")

        def call(self, inputs):
            enc, dec = inputs
            return self.head(self.pool(self.transformer(enc, dec)))

    model = Classifier()
    model.compile(
        optimizer=tf.keras.optimizers.Adam(
            beta_1=0.9, beta_2=0.98, epsilon=1e-9
        ),
        loss="categorical_crossentropy",
        metrics=["accuracy"],
    )
    xf = x_train.astype(np.float32)
    t0 = time.perf_counter()
    hist = model.fit(
        [xf, xf],
        y_train_1h,
        batch_size=128,
        epochs=epochs,
        validation_split=0.2,
        verbose=2,
        callbacks=[tf.keras.callbacks.EarlyStopping(patience=3)],
    )
    elapsed = time.perf_counter() - t0
    xt = x_test.astype(np.float32)
    loss, acc = model.evaluate([xt, xt], y_test_1h, batch_size=128, verbose=0)
    n_ex = int(len(xf) * 0.8) * len(hist.history["loss"])
    print(
        json.dumps(
            {
                "framework": "reference (TF, CPU)",
                "model": "Transformer/SyntheticImdb",
                "epochs_ran": len(hist.history["loss"]),
                "test_accuracy": round(float(acc), 4),
                "examples_per_sec": round(n_ex / elapsed, 1),
            }
        )
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "gcn"
    if which == "gcn":
        run_gcn()
    else:
        run_transformer(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
