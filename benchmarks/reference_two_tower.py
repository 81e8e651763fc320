"""Measure the REFERENCE two-tower retrieval stack (TF/keras, CPU) on the
shared synthetic ml-1m corpus — pins the retrieval quality rows of
BASELINE.md (VERDICT round-2 "Next" #3).

Uses the reference's OWN classes from /root/reference:
- ``Retrieval`` loss layer (deep_recommenders/keras/models/retrieval/
  sbcnm.py:89-163): scores = Q C^T, labels = eye, temperature, sum-reduced
  softmax CE;
- ``BruteForce`` exact index (factorized_top_k.py:263-334);
- ``FactorizedTopK`` metric bank (factorized_top_k.py:464-522), top-k
  categorical accuracy at k in {1, 5, 10, 50, 100}.

The reference provides no tower model (its examples never assemble a
two-tower), so the towers here mirror OUR benchmark's architecture exactly
(benchmarks/two_tower_quality.py): per-feature 32-dim embeddings -> concat
-> Dense(64, relu) -> Dense(32) -> L2 normalize; user tower over
user_id/gender/age/occupation, movie tower over movie_id/genres; Adagrad
(0.05), temperature 0.1, batch 1024. Evaluation: every unique movie in the
test split is a candidate; metric updated over all test batches.

Environment notes: requires TF_USE_LEGACY_KERAS=1 (reference keras classes
predate Keras 3; the script re-execs itself with it set) and stubs the
unavailable ``faiss`` module (the reference's only native dep — only its
``Faiss`` index class needs it, which this benchmark does not use).

Usage: python benchmarks/reference_two_tower.py [--epochs 5] [--out p.json]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

if os.environ.get("TF_USE_LEGACY_KERAS") != "1":
    os.environ["TF_USE_LEGACY_KERAS"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

faiss_stub = types.ModuleType("faiss")
faiss_stub.IndexFlatIP = object
faiss_stub.IndexIVFFlat = object
sys.modules["faiss"] = faiss_stub

sys.path.insert(0, "/root/reference")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--num-ratings", type=int, default=1_000_209)
    ap.add_argument(
        "--movie-popularity", default="rank-power",
        help="synthetic movie marginal; rank-power (finite skew, full "
        "movie coverage) is the retrieval-parity protocol on BOTH sides",
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    tf.random.set_seed(42)

    from deep_recommenders.keras.models.retrieval.factorized_top_k import (
        BruteForce,
        FactorizedTopK,
    )
    from deep_recommenders.keras.models.retrieval.sbcnm import Retrieval

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

    corpus = synthesize_ml1m(
        num_ratings=args.num_ratings, seed=42,
        movie_popularity=args.movie_popularity,
    )
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
    rng = np.random.default_rng(42)
    perm = rng.permutation(n)
    feats = {k: v[perm] for k, v in feats.items()}
    ratings = np.asarray(corpus["Rating"])[perm]
    split = int(0.8 * n)
    # Positives-only protocol (rating > 3), matching
    # benchmarks/two_tower_quality.py's retrieval_arrays on the TPU side:
    # the retrieval task trains and evaluates on liked pairs.
    pos_train = ratings[:split] > 3
    pos_test = ratings[split:] > 3
    train = {k: v[:split][pos_train] for k, v in feats.items()}
    test = {k: v[split:][pos_test] for k, v in feats.items()}

    fc = tf.feature_column
    dim = 32
    user_cols = [
        fc.embedding_column(
            fc.categorical_column_with_hash_bucket("user_id", NUM_USERS),
            dim),
        fc.embedding_column(fc.categorical_column_with_vocabulary_list(
            "user_gender", list(GENDER_VOCAB)), dim),
        fc.embedding_column(fc.categorical_column_with_vocabulary_list(
            "user_age", [int(a) for a in AGE_VOCAB]), dim),
        fc.embedding_column(fc.categorical_column_with_vocabulary_list(
            "user_occupation", [int(o) for o in OCCUPATION_VOCAB]), dim),
    ]
    movie_cols = [
        fc.embedding_column(
            fc.categorical_column_with_hash_bucket("movie_id", NUM_MOVIES),
            dim),
        fc.embedding_column(fc.categorical_column_with_vocabulary_list(
            "movie_genres", list(GENRES_VOCAB)), dim),
    ]

    def tower(cols, name):
        return tf.keras.Sequential(
            [
                tf.keras.layers.DenseFeatures(cols),
                tf.keras.layers.Dense(64, activation="relu"),
                tf.keras.layers.Dense(32),
                tf.keras.layers.Lambda(
                    lambda x: tf.math.l2_normalize(x, axis=-1)),
            ],
            name=name,
        )

    user_tower = tower(user_cols, "user_tower")
    movie_tower = tower(movie_cols, "movie_tower")
    task = Retrieval(temperature=0.1)
    opt = tf.keras.optimizers.legacy.Adagrad(0.05)

    user_keys = ("user_id", "user_gender", "user_age", "user_occupation")
    movie_keys = ("movie_id", "movie_genres")

    def ds_from(frame, shuffle_seed=None):
        d = tf.data.Dataset.from_tensor_slices(
            {k: np.asarray(v) for k, v in frame.items()})
        if shuffle_seed is not None:
            d = d.shuffle(50_000, seed=shuffle_seed)
        return d.batch(args.batch_size, drop_remainder=True)

    @tf.function
    def train_step(batch):
        with tf.GradientTape() as tape:
            qe = user_tower({k: batch[k] for k in user_keys})
            ce = movie_tower({k: batch[k] for k in movie_keys})
            loss = task(qe, ce, compute_metrics=False)
        variables = (user_tower.trainable_variables
                     + movie_tower.trainable_variables)
        grads = tape.gradient(loss, variables)
        opt.apply_gradients(zip(grads, variables))
        return loss

    # Build variables outside the timed window.
    first = next(iter(ds_from(train)))
    train_step(first)
    t0 = time.perf_counter()
    examples = 0
    for epoch in range(args.epochs):
        for batch in ds_from(train, shuffle_seed=42 + epoch):
            train_step(batch)
            examples += args.batch_size
    train_ex_per_s = examples / (time.perf_counter() - t0)

    # Candidate corpus: every unique movie in the test split (same recipe
    # as benchmarks/two_tower_quality.py).
    _, first_rows = np.unique(test["movie_id"], return_index=True)
    corpus_batch = {k: np.asarray(test[k][first_rows]) for k in movie_keys}
    corpus_emb = movie_tower(corpus_batch)
    index = BruteForce(k=100)
    index.index(corpus_emb)
    metric = FactorizedTopK(candidates=index, k=100)

    for batch in ds_from(test):
        qe = user_tower({k: batch[k] for k in user_keys})
        ce = movie_tower({k: batch[k] for k in movie_keys})
        metric.update_state(qe, ce)

    results = {
        m.name.split("/")[-1]: round(float(m.result()), 4)
        for m in metric.metrics
    }
    row = {
        "framework": "reference (TF %s + tf_keras, CPU)" % tf.__version__,
        "model": "TwoTower",
        "corpus_movies": int(corpus_emb.shape[0]),
        "epochs": args.epochs,
        "train_examples_per_sec": round(train_ex_per_s, 1),
        **results,
    }
    print(json.dumps(row))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(row, f, indent=1)


if __name__ == "__main__":
    main()
