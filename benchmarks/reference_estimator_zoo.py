"""Measure the REFERENCE estimator-branch models (FM, WDL, FNN, MMoE) on CPU
to pin the remaining BASELINE.md parity rows (VERDICT round-2 "Next" #3).

The reference publishes no metrics; the parity bar is "measure its own code
ourselves". This script imports the reference's own model classes from
/root/reference —
``deep_recommenders.estimator.models.feature_interaction.FM``,
``...ranking.WDL``, ``...ranking.FNN``,
``...multi_task_learning.MMoE`` — and trains them with a hand-rolled
tf.compat.v1 graph/session loop that replaces only the removed
``tf.estimator`` *runtime* (TF 2.21 dropped tf.estimator; the model code
itself runs unmodified). Optimizers, losses, metrics, dims and column
definitions mirror the reference examples line-for-line:

- FM:  sigmoid CE on logits, Adam 0.01, AUC on sigmoid
  (ref examples/train_fm_on_movielens_estimator.py:46-53)
- WDL: WDL(indicator+crossed, embedding, [64, 16]), log_loss,
  FTRL(0.01, l1=0.5) on the "wide" collection / Adam(0.01) on "deep"
  (ref examples/train_wdl_on_movielens_estimator.py:55-80)
- FNN: train FM first, export a v1 SavedModel (tag "serve", MODEL_VARIABLES
  collection — what FNN.warm_up reads, ref fnn.py:32-48), then
  FNN(ind, emb, path, [64, 32]), log_loss, Adam 0.01
  (ref examples/train_fnn_on_movielens_estimator.py:38-56)
- MMoE: reference SyntheticForMultiTask(512k, dim 256), 2 tasks x 2 experts,
  expert [64,32] / task [32,10], Adam 0.01, two grouped minimize calls,
  per-task eval MSE (ref examples/train_mmoe_on_synthetic_estimator.py:20-60)

Environment compatibility notes (documented deviations):
- Requires TF_USE_LEGACY_KERAS=1 so tf.compat.v1.layers (used by the
  reference ``dnn()`` primitive) resolves against tf_keras instead of
  Keras 3 (which removed it). The script re-execs itself with the env set.
- Data: the SAME synthetic ml-1m corpus our examples train on
  (deep_recommenders_tpu.datasets.movielens.synthesize_ml1m, seed 42),
  label = rating > 3, clean 0.8/0.2 split, shuffle(50k, seed 42) — the
  identical protocol reference_baseline.py uses for the DeepFM row.
- movie_genres uses the REAL genre vocab in both frameworks (the reference
  examples build it from gender_vocab — a documented reference bug,
  SURVEY fidelity notes — being generous to the reference here).

Usage: python benchmarks/reference_estimator_zoo.py [--num-ratings N]
       [--epochs E] [--models fm,wdl,fnn,mmoe] [--out path.json]
Prints one JSON line per model.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

if os.environ.get("TF_USE_LEGACY_KERAS") != "1":
    os.environ["TF_USE_LEGACY_KERAS"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, "/root/reference")

import numpy as np


def load_corpus(num_ratings):
    from deep_recommenders_tpu.datasets.movielens import (
        MAX_GENRES,
        synthesize_ml1m,
    )

    corpus = synthesize_ml1m(num_ratings=num_ratings, seed=42)
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
    rng = np.random.default_rng(42)
    perm = rng.permutation(n)
    feats = {k: v[perm] for k, v in feats.items()}
    labels = labels[perm]
    split = int(0.8 * n)
    train = {k: v[:split] for k, v in feats.items()}, labels[:split]
    test = {k: v[split:] for k, v in feats.items()}, labels[split:]
    return train, test


def build_columns(tf):
    """Reference build_columns() with the real genre vocab (see module doc)."""
    from deep_recommenders_tpu.datasets.movielens import (
        AGE_VOCAB,
        GENDER_VOCAB,
        GENRES_VOCAB,
        NUM_MOVIES,
        NUM_USERS,
        OCCUPATION_VOCAB,
    )

    fc = tf.feature_column
    base = [
        fc.categorical_column_with_hash_bucket("user_id", NUM_USERS),
        fc.categorical_column_with_vocabulary_list(
            "user_gender", list(GENDER_VOCAB)),
        fc.categorical_column_with_vocabulary_list(
            "user_age", [int(a) for a in AGE_VOCAB]),
        fc.categorical_column_with_vocabulary_list(
            "user_occupation", [int(o) for o in OCCUPATION_VOCAB]),
        fc.categorical_column_with_hash_bucket("movie_id", NUM_MOVIES),
        fc.categorical_column_with_vocabulary_list(
            "movie_genres", list(GENRES_VOCAB)),
    ]
    indicator = [fc.indicator_column(c) for c in base]
    embedding = [fc.embedding_column(c, dimension=16) for c in base]
    return indicator, embedding


def batches(features, labels, batch_size, shuffle_seed=None):
    n = len(labels)
    idx = np.arange(n)
    if shuffle_seed is not None:
        np.random.default_rng(shuffle_seed).shuffle(idx)
    for s in range(0, n - batch_size + 1, batch_size):
        j = idx[s: s + batch_size]
        yield {k: v[j] for k, v in features.items()}, labels[j]


def make_placeholders(tf, batch_size):
    return {
        "user_id": tf.placeholder(tf.string, [batch_size]),
        "user_gender": tf.placeholder(tf.string, [batch_size]),
        "user_age": tf.placeholder(tf.int64, [batch_size]),
        "user_occupation": tf.placeholder(tf.int64, [batch_size]),
        "movie_id": tf.placeholder(tf.string, [batch_size]),
        "movie_genres": tf.placeholder(tf.string, [batch_size, None]),
    }


def run_ctr_model(tf, name, build_outputs_and_train_op, train, test,
                  epochs, batch_size, export_fm_to=None):
    """Train/eval one reference CTR model in a fresh v1 graph."""
    g = tf.Graph()
    with g.as_default():
        tf.set_random_seed(42)
        ph = make_placeholders(tf, batch_size)
        labels_ph = tf.placeholder(tf.float32, [batch_size, 1])
        probs, train_op = build_outputs_and_train_op(ph, labels_ph)
        auc_value, auc_update = tf.metrics.auc(labels_ph, probs)
        config = tf.ConfigProto(device_count={"GPU": 0},
                                inter_op_parallelism_threads=8,
                                intra_op_parallelism_threads=8)
        with tf.Session(config=config) as sess:
            sess.run(tf.global_variables_initializer())
            sess.run(tf.tables_initializer())
            t0 = time.perf_counter()
            steps = 0
            for epoch in range(epochs):
                for fb, lb in batches(train[0], train[1], batch_size,
                                      shuffle_seed=42 + epoch):
                    feed = {ph[k]: fb[k] for k in ph}
                    feed[labels_ph] = lb
                    sess.run(train_op, feed)
                    steps += 1
            elapsed = time.perf_counter() - t0
            sess.run(tf.local_variables_initializer())
            for fb, lb in batches(test[0], test[1], batch_size):
                feed = {ph[k]: fb[k] for k in ph}
                feed[labels_ph] = lb
                sess.run(auc_update, feed)
            auc = float(sess.run(auc_value))
            if export_fm_to is not None:
                tf.saved_model.simple_save(
                    sess, export_fm_to,
                    inputs={k: v for k, v in ph.items()},
                    outputs={"predictions": probs},
                )
    row = {
        "framework": "reference (TF compat.v1 graph, CPU)",
        "model": name,
        "epochs": epochs,
        "val_auc": round(auc, 4),
        "examples_per_sec": round(steps * batch_size / elapsed, 1),
    }
    print(json.dumps(row))
    return row


def run_fm(tf, train, test, epochs, batch_size, export_to=None):
    from deep_recommenders.estimator.models.feature_interaction import FM

    def build(ph, labels_ph):
        indicator, embedding = build_columns(tf)
        logits = FM(indicator, embedding)(ph)
        loss = tf.losses.sigmoid_cross_entropy(labels_ph, logits)
        opt = tf.train.AdamOptimizer(learning_rate=0.01)
        train_op = opt.minimize(loss)
        return tf.nn.sigmoid(logits), train_op

    return run_ctr_model(tf, "FM", build, train, test, epochs, batch_size,
                         export_fm_to=export_to)


def run_wdl(tf, train, test, epochs, batch_size):
    from deep_recommenders.estimator.models.ranking import WDL

    def build(ph, labels_ph):
        fc = tf.feature_column
        indicator, embedding = build_columns(tf)
        crossed = [
            fc.indicator_column(c) for c in (
                fc.crossed_column(["user_gender", "user_age"], 14),
                fc.crossed_column(["user_gender", "user_occupation"], 40),
                fc.crossed_column(["user_age", "user_occupation"], 140),
            )
        ]
        probs = WDL(indicator + crossed, embedding, [64, 16])(ph)
        loss = tf.losses.log_loss(labels_ph, probs)
        wide_vars = tf.get_collection(tf.GraphKeys.MODEL_VARIABLES, "wide")
        wide_op = tf.train.FtrlOptimizer(
            0.01, l1_regularization_strength=0.5
        ).minimize(loss, var_list=wide_vars)
        deep_vars = tf.get_collection(tf.GraphKeys.MODEL_VARIABLES, "deep")
        deep_op = tf.train.AdamOptimizer(0.01).minimize(
            loss, var_list=deep_vars)
        return probs, tf.group(wide_op, deep_op)

    return run_ctr_model(tf, "WDL", build, train, test, epochs, batch_size)


def run_fnn(tf, train, test, epochs, batch_size, fm_export_dir):
    from deep_recommenders.estimator.models.ranking import FNN

    def build(ph, labels_ph):
        indicator, embedding = build_columns(tf)
        probs = FNN(indicator, embedding, fm_export_dir, [64, 32])(ph)
        loss = tf.losses.log_loss(labels_ph, probs)
        train_op = tf.train.AdamOptimizer(0.01).minimize(loss)
        return probs, train_op

    return run_ctr_model(tf, "FNN", build, train, test, epochs, batch_size)


def run_mmoe(tf):
    from deep_recommenders.datasets import SyntheticForMultiTask
    from deep_recommenders.estimator.models.multi_task_learning import MMoE

    example_dim = 256
    g = tf.Graph()
    with g.as_default():
        tf.set_random_seed(42)
        np.random.seed(42)
        synthetic = SyntheticForMultiTask(512 * 1000,
                                          example_dim=example_dim)
        ds = synthetic.input_fn()
        train_it = tf.data.make_one_shot_iterator(ds.take(800)).get_next()
        eval_it = tf.data.make_one_shot_iterator(
            ds.skip(800).take(200)).get_next()

        columns = [tf.feature_column.numeric_column(f"C{i}")
                   for i in range(example_dim)]
        model = MMoE(columns, num_tasks=2, num_experts=2,
                     task_hidden_units=[32, 10],
                     expert_hidden_units=[64, 32])

        def graph_for(batch):
            features, labels = batch
            outputs = model(features)
            l0 = tf.expand_dims(labels["labels0"], axis=1)
            l1 = tf.expand_dims(labels["labels1"], axis=1)
            mse0 = tf.losses.mean_squared_error(l0, outputs[0])
            mse1 = tf.losses.mean_squared_error(l1, outputs[1])
            return mse0, mse1

        with tf.variable_scope("mmoe", reuse=tf.AUTO_REUSE):
            mse0, mse1 = graph_for(train_it)
        opt = tf.train.AdamOptimizer(0.01)
        train_op = tf.group(opt.minimize(mse0), opt.minimize(mse1))
        with tf.variable_scope("mmoe", reuse=True):
            eval_mse0, eval_mse1 = graph_for(eval_it)

        config = tf.ConfigProto(device_count={"GPU": 0},
                                inter_op_parallelism_threads=8,
                                intra_op_parallelism_threads=8)
        with tf.Session(config=config) as sess:
            sess.run(tf.global_variables_initializer())
            t0 = time.perf_counter()
            steps = 0
            try:
                while True:
                    sess.run(train_op)
                    steps += 1
            except tf.errors.OutOfRangeError:
                pass
            elapsed = time.perf_counter() - t0
            m0, m1, n_eval = 0.0, 0.0, 0
            try:
                while True:
                    a, b = sess.run([eval_mse0, eval_mse1])
                    m0 += float(a)
                    m1 += float(b)
                    n_eval += 1
            except tf.errors.OutOfRangeError:
                pass
    row = {
        "framework": "reference (TF compat.v1 graph, CPU)",
        "model": "MMoE",
        "train_steps": steps,
        "task0_mse": round(m0 / n_eval, 4),
        "task1_mse": round(m1 / n_eval, 4),
        "examples_per_sec": round(steps * 512 / elapsed, 1),
    }
    print(json.dumps(row))
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-ratings", type=int, default=1_000_209)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--models", default="fm,wdl,fnn,mmoe")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    models = set(args.models.split(","))

    import tensorflow.compat.v1 as tf

    tf.disable_eager_execution()
    tf.logging.set_verbosity(tf.logging.ERROR)

    # fnn.py and wide_and_deep.py import TF2 without the version-gated
    # compat.v1 switch the sibling modules have (they were only ever run on
    # TF1); point their module-level ``tf`` at compat.v1 like dnn.py does.
    import deep_recommenders.estimator.models.ranking.fnn as _fnn_mod
    import deep_recommenders.estimator.models.ranking.wide_and_deep as _wdl_mod

    _fnn_mod.tf = tf
    _wdl_mod.tf = tf

    rows = []
    if models & {"fm", "wdl", "fnn"}:
        train, test = load_corpus(args.num_ratings)
    fm_dir = None
    if "fm" in models or "fnn" in models:
        fm_dir = os.path.join(tempfile.mkdtemp(prefix="ref_fm_"), "export")
        rows.append(run_fm(tf, train, test, args.epochs, args.batch_size,
                           export_to=fm_dir))
    if "wdl" in models:
        rows.append(run_wdl(tf, train, test, args.epochs, args.batch_size))
    if "fnn" in models:
        rows.append(run_fnn(tf, train, test, args.epochs, args.batch_size,
                            fm_dir))
    if "mmoe" in models:
        rows.append(run_mmoe(tf))

    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
