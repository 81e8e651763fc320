"""Measure the REFERENCE DeepFM (TF/keras, CPU) on the shared synthetic
MovieLens corpus, to pin the BASELINE.md parity numbers.

The reference publishes no metrics (BASELINE.md), so the parity bar is
"measure it ourselves". This script runs the reference's own model classes —
``deep_recommenders.keras.models.ranking.DeepFM`` and its ``FM`` layer,
imported from /root/reference — fed with the SAME synthetic ml-1m corpus our
examples train on (deep_recommenders_tpu.datasets.movielens.synthesize_ml1m),
same label binarization (rating > 3) and 0.8/0.2 split, mirroring
examples/train_deepfm_on_movielens_keras.py (Adam defaults, BCE,
AUC/Precision/Recall, batch 1024).

Environment compatibility notes (documented deviations):
- TF 2.21 / Keras 3 removed ``tf.keras.layers.DenseFeatures`` and
  tf.estimator; this script installs a faithful shim implementing
  indicator/embedding feature-column semantics (hash via
  ``tf.strings.to_hash_bucket_fast``, vocab lookup, mean-combined bags,
  truncated-normal 1/sqrt(dim) embedding init) so the reference model code
  runs unmodified. Hash functions differ from our CRC32 (FarmHash here):
  bucket-collision *rates* match, exact collisions don't — AUC comparisons
  are statistical, not bit-exact.
- The reference examples build movie_genres from gender_vocab (a documented
  reference bug, SURVEY fidelity notes); this runner uses the real genre
  vocab in BOTH frameworks so quality is comparable (generous to the
  reference).

Usage: python benchmarks/reference_baseline.py [--num-ratings N] [--epochs E]
Prints one JSON line with final val AUC/precision/recall + examples/sec.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_shim(tf):
    """A DenseFeatures replacement for Keras 3 interpreting our lightweight
    column descriptors (same attribute shape as tf.feature_column's)."""

    class HashColumn:
        def __init__(self, key, buckets):
            self.key, self.hash_bucket_size = key, buckets

    class VocabColumn:
        def __init__(self, key, vocab):
            self.key, self.vocabulary_list = key, list(vocab)

    class IndicatorColumn:
        def __init__(self, cat):
            self.categorical_column = cat

    class EmbeddingColumn:
        def __init__(self, cat, dimension):
            self.categorical_column = cat
            self.dimension = dimension

    def _num_buckets(cat):
        if isinstance(cat, HashColumn):
            return cat.hash_bucket_size
        return len(cat.vocabulary_list)

    def _to_ids_and_mask(cat, x):
        """x: (B,) or (B, L) raw tensor -> int ids + validity mask."""
        if isinstance(cat, HashColumn):
            s = tf.strings.as_string(x) if x.dtype != tf.string else x
            ids = tf.strings.to_hash_bucket_fast(s, cat.hash_bucket_size)
            mask = (
                tf.ones_like(ids, tf.float32)
                if x.dtype != tf.string
                else tf.cast(tf.strings.length(s) > 0, tf.float32)
            )
            return ids, mask
        vocab = cat.vocabulary_list
        if isinstance(vocab[0], str):
            keys = tf.constant(vocab)
            s = x if x.dtype == tf.string else tf.strings.as_string(x)
        else:
            keys = tf.constant(np.asarray(vocab, np.int64))
            s = tf.cast(x, tf.int64)
        table = tf.lookup.StaticHashTable(
            tf.lookup.KeyValueTensorInitializer(
                keys, tf.range(len(vocab), dtype=tf.int64)
            ),
            default_value=-1,
        )
        ids = table.lookup(s)
        mask = tf.cast(ids >= 0, tf.float32)
        return tf.maximum(ids, 0), mask

    class DenseFeaturesShim(tf.keras.layers.Layer):
        def __init__(self, columns, **kwargs):
            super().__init__(**kwargs)
            self._columns = columns if isinstance(columns, list) else [columns]
            self._tables = {}
            for c in self._columns:
                if isinstance(c, EmbeddingColumn):
                    n = _num_buckets(c.categorical_column)
                    self._tables[c.categorical_column.key] = self.add_weight(
                        name=f"emb_{c.categorical_column.key}",
                        shape=(n, c.dimension),
                        initializer=tf.keras.initializers.TruncatedNormal(
                            stddev=1.0 / np.sqrt(c.dimension)
                        ),
                        trainable=True,
                    )

        def call(self, inputs):
            outs = []
            for c in self._columns:
                cat = c.categorical_column
                x = inputs[cat.key]
                ids, mask = _to_ids_and_mask(cat, x)
                n = _num_buckets(cat)
                if isinstance(c, IndicatorColumn):
                    oh = tf.one_hot(ids, n)  # (B, [L,] n)
                    if oh.shape.rank == 3:
                        oh = tf.reduce_sum(oh * mask[..., None], axis=1)
                    outs.append(oh)
                else:
                    tbl = self._tables[cat.key]
                    vecs = tf.nn.embedding_lookup(tbl, ids)
                    if vecs.shape.rank == 3:  # mean combiner (fc default)
                        denom = tf.maximum(
                            tf.reduce_sum(mask, axis=1, keepdims=True), 1.0
                        )
                        vecs = (
                            tf.reduce_sum(vecs * mask[..., None], axis=1)
                            / denom
                        )
                    outs.append(vecs)
            return tf.concat(outs, axis=-1)

    return (
        DenseFeaturesShim,
        HashColumn,
        VocabColumn,
        IndicatorColumn,
        EmbeddingColumn,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-ratings", type=int, default=200_000)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=1024)
    args = ap.parse_args()

    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    (
        DenseFeaturesShim,
        HashColumn,
        VocabColumn,
        IndicatorColumn,
        EmbeddingColumn,
    ) = build_shim(tf)
    tf.keras.layers.DenseFeatures = DenseFeaturesShim

    sys.path.insert(0, "/root/reference")
    from deep_recommenders.keras.models.ranking import DeepFM  # noqa

    from deep_recommenders_tpu.datasets.movielens import (
        AGE_VOCAB,
        GENDER_VOCAB,
        GENRES_VOCAB,
        MAX_GENRES,
        NUM_MOVIES,
        NUM_USERS,
        OCCUPATION_VOCAB,
        synthesize_ml1m,
    )

    corpus = synthesize_ml1m(num_ratings=args.num_ratings, seed=42)
    n = len(corpus["Rating"])
    genres = np.full((n, MAX_GENRES), "", dtype=object)
    for i, g in enumerate(corpus["Genres"]):
        genres[i, : min(len(g), MAX_GENRES)] = list(g)[:MAX_GENRES]
    feats = {
        "user_id": corpus["UserID"].astype(str),
        "user_gender": corpus["Gender"].astype(str),
        "user_age": corpus["Age"].astype(np.int64),
        "user_occupation": corpus["Occupation"].astype(np.int64),
        "movie_id": corpus["MovieID"].astype(str),
        "movie_genres": genres.astype(str),
    }
    labels = (corpus["Rating"] > 3).astype(np.float32)[:, None]
    split = int(0.8 * n)
    train = {k: v[:split] for k, v in feats.items()}, labels[:split]
    test = {k: v[split:] for k, v in feats.items()}, labels[split:]

    ds_train = (
        tf.data.Dataset.from_tensor_slices(train)
        .shuffle(50_000, seed=42)
        .batch(args.batch_size, drop_remainder=True)
    )
    ds_test = tf.data.Dataset.from_tensor_slices(test).batch(
        args.batch_size, drop_remainder=True
    )

    base = [
        HashColumn("user_id", NUM_USERS),
        VocabColumn("user_gender", GENDER_VOCAB),
        VocabColumn("user_age", AGE_VOCAB),
        VocabColumn("user_occupation", OCCUPATION_VOCAB),
        HashColumn("movie_id", NUM_MOVIES),
        VocabColumn("movie_genres", GENRES_VOCAB),
    ]
    indicator = [IndicatorColumn(c) for c in base]
    embedding = [EmbeddingColumn(c, 16) for c in base]

    model = DeepFM(indicator, embedding, dnn_units_size=[256, 32])
    model.compile(
        loss=tf.keras.losses.binary_crossentropy,
        optimizer=tf.keras.optimizers.Adam(),
        metrics=[
            tf.keras.metrics.AUC(name="auc"),
            tf.keras.metrics.Precision(name="precision"),
            tf.keras.metrics.Recall(name="recall"),
        ],
    )
    t0 = time.perf_counter()
    hist = model.fit(
        ds_train,
        epochs=args.epochs,
        validation_data=ds_test,
        verbose=2,
        callbacks=[tf.keras.callbacks.EarlyStopping(patience=3)],
    )
    elapsed = time.perf_counter() - t0
    steps = (split // args.batch_size) * len(hist.history["loss"])
    print(
        json.dumps(
            {
                "framework": "reference (TF %s, CPU)" % tf.__version__,
                "model": "DeepFM",
                "num_ratings": args.num_ratings,
                "epochs_ran": len(hist.history["loss"]),
                "val_auc": round(float(hist.history["val_auc"][-1]), 4),
                "val_precision": round(
                    float(hist.history["val_precision"][-1]), 4
                ),
                "val_recall": round(float(hist.history["val_recall"][-1]), 4),
                "examples_per_sec": round(
                    steps * args.batch_size / elapsed, 1
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
