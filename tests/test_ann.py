"""ANN indexes (ApproxTopK, IVF) — parity with ref Faiss index semantics
(ref keras/models/retrieval/factorized_top_k.py:337-461), tested like the
reference tests its faiss wrapper (tests/keras/test_factorized_top_k.py:36-60:
identifier dtypes, agreement with exact search)."""

import jax.numpy as jnp
import numpy as np
import pytest

from deep_recommenders_tpu.models.retrieval import (
    IVF,
    ApproxTopK,
    BruteForce,
    FactorizedTopK,
    kmeans,
)


def _clustered_corpus(rng, n_clusters=16, per=64, dim=32):
    centers = rng.normal(0, 5.0, (n_clusters, dim))
    pts = np.concatenate(
        [c + rng.normal(0, 0.3, (per, dim)) for c in centers]
    ).astype(np.float32)
    return pts


def test_kmeans_assigns_to_nearest_centroid(rng):
    pts = _clustered_corpus(rng)
    init = pts[rng.choice(len(pts), 16, replace=False)]
    centroids, assign = kmeans(jnp.asarray(pts), jnp.asarray(init), 16, 10)
    d = ((pts[:, None, :] - np.asarray(centroids)[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(assign), d.argmin(1))


def test_ivf_full_probe_matches_brute_force(rng):
    pts = _clustered_corpus(rng, n_clusters=8, per=32)
    q = rng.normal(0, 5.0, (10, 32)).astype(np.float32)
    exact_s, exact_i = BruteForce().index(pts)(q, k=5)
    ivf = IVF(nlist=8, nprobe=8).index(pts)
    s, i = ivf(q, k=5)
    np.testing.assert_allclose(
        np.asarray(s), np.asarray(exact_s), rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(i), np.asarray(exact_i))


def test_ivf_partial_probe_recall(rng):
    pts = _clustered_corpus(rng, n_clusters=16, per=64)
    # queries near corpus points: high recall expected even at nprobe=4
    q = pts[rng.choice(len(pts), 32)] + rng.normal(
        0, 0.05, (32, 32)
    ).astype(np.float32)
    _, exact_i = BruteForce().index(pts)(q, k=10)
    _, i = IVF(nlist=16, nprobe=4).index(pts)(q, k=10)
    recall = np.mean(
        [
            len(set(np.asarray(i)[r]) & set(np.asarray(exact_i)[r])) / 10
            for r in range(32)
        ]
    )
    assert recall > 0.8, recall


def test_ivf_identifier_remapping(rng):
    pts = rng.normal(0, 1, (64, 8)).astype(np.float32)
    ids = np.arange(1000, 1064)
    q = rng.normal(0, 1, (4, 8)).astype(np.float32)
    _, i = IVF(nlist=4, nprobe=4).index(pts, ids)(q, k=3)
    assert np.all(np.asarray(i) >= 1000)
    # string identifiers come back host-side
    sids = np.array([f"movie_{j}" for j in range(64)])
    _, si = IVF(nlist=4, nprobe=4).index(pts, sids)(q, k=3)
    assert si.dtype.kind == "U" and si.shape == (4, 3)


def test_ivf_error_contracts(rng):
    with pytest.raises(ValueError):
        IVF(nlist=4, nprobe=8)
    with pytest.raises(ValueError):
        IVF(nlist=64, nprobe=4).index(np.zeros((8, 4), np.float32))
    with pytest.raises(ValueError):
        IVF(nlist=4, nprobe=2).index(
            np.zeros((8, 4), np.float32), identifiers=np.arange(7)
        )
    with pytest.raises(ValueError):
        IVF(nlist=4, nprobe=2)(np.zeros((2, 4), np.float32))


def test_ivf_k_larger_than_probed_pads(rng):
    pts = rng.normal(0, 1, (16, 4)).astype(np.float32)
    q = rng.normal(0, 1, (2, 4)).astype(np.float32)
    s, i = IVF(nlist=8, nprobe=1).index(pts)(q, k=12)
    assert s.shape == (2, 12) and i.shape == (2, 12)
    assert np.all(np.asarray(i)[np.asarray(s) < -1e29] == -1)


def test_approx_topk_matches_exact_on_cpu(rng):
    pts = rng.normal(0, 1, (256, 16)).astype(np.float32)
    q = rng.normal(0, 1, (8, 16)).astype(np.float32)
    es, ei = BruteForce().index(pts)(q, k=10)
    s, i = ApproxTopK(recall_target=0.99).index(pts)(q, k=10)
    # approx_max_k may return elements in slightly different order/set;
    # on clear margins the sets agree
    assert (
        np.mean(
            [
                len(set(np.asarray(i)[r]) & set(np.asarray(ei)[r])) / 10
                for r in range(8)
            ]
        )
        > 0.9
    )


def test_approx_topk_normalize_is_cosine(rng):
    pts = rng.normal(0, 1, (64, 8)).astype(np.float32)
    q = rng.normal(0, 1, (4, 8)).astype(np.float32)
    s, _ = ApproxTopK(normalize=True).index(pts)(q, k=5)
    assert np.all(np.asarray(s) <= 1.0 + 1e-5)


def test_factorized_topk_metric_with_ivf_index(rng):
    pts = rng.normal(0, 1, (256, 32)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    rows = rng.choice(len(pts), 16, replace=False)
    q = (pts[rows] + rng.normal(0, 0.01, (16, 32))).astype(np.float32)
    metric = FactorizedTopK(
        index=IVF(nlist=8, nprobe=8).index(pts), ks=(1, 5, 10)
    )
    state = metric.update(metric.init(), q, pts[rows])
    out = metric.compute(state)
    assert float(out["top_10_categorical_accuracy"]) > 0.9
