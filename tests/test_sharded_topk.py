"""Mesh-sharded exact top-k retrieval: parity with single-device BruteForce.

The round-3 bar (VERDICT #1 / SURVEY §5.8 last bullet): corpus rows sharded
over the mesh "model" axis, per-shard top-k inside one shard_map, cross-shard
merge with the Streaming merge algebra — asserting EXACT equality (scores AND
ids) with the single-device search on the same corpus, including the
FactorizedTopK metric bank fed by the sharded index.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from deep_recommenders_tpu.models.retrieval import (
    BruteForce,
    FactorizedTopK,
    ShardedBruteForce,
    load_index,
    save_index,
)
from deep_recommenders_tpu.ops.topk import sharded_top_k
from deep_recommenders_tpu.parallel import MeshConfig, create_mesh


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(MeshConfig(data=2, model=4))


@pytest.fixture(scope="module")
def mesh_model8():
    return create_mesh(MeshConfig(data=1, model=8))


def _corpus(rng, n=100, d=16):
    cand = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(8, d)).astype(np.float32)
    return q, cand


def test_sharded_top_k_matches_dense(mesh, rng):
    q, cand = _corpus(rng)  # 100 rows: not divisible by |model|=4
    n_model = mesh.shape["model"]
    pad = (-cand.shape[0]) % n_model
    padded = np.concatenate(
        [cand, np.zeros((pad, cand.shape[1]), cand.dtype)], axis=0
    )
    for k in (1, 5, 13):
        s, i = sharded_top_k(
            jnp.asarray(q), jnp.asarray(padded), k, mesh,
            num_valid=cand.shape[0],
        )
        ref_s, ref_i = jax.lax.top_k(jnp.asarray(q) @ cand.T, k)
        np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))


def test_sharded_top_k_queries_data_sharded(mesh, rng):
    """Inside a data-parallel eval step: query batch sharded over "data"."""
    q, cand = _corpus(rng, n=64)
    qg = jax.device_put(q, NamedSharding(mesh, P("data", None)))
    s, i = sharded_top_k(
        qg, jnp.asarray(cand), 7, mesh, queries_data_sharded=True
    )
    ref_s, ref_i = jax.lax.top_k(jnp.asarray(q) @ cand.T, 7)
    np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))


def test_sharded_brute_force_matches_brute_force(mesh, rng):
    q, cand = _corpus(rng)
    dense = BruteForce().index(cand)
    sharded = ShardedBruteForce(mesh).index(cand)
    for k in (1, 10, 50):
        ds, di = dense(q, k=k)
        ss, si = sharded(q, k=k)
        np.testing.assert_allclose(
            np.asarray(ss), np.asarray(ds), rtol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(si), np.asarray(di))


def test_sharded_brute_force_model8(mesh_model8, rng):
    """Pure model-parallel mesh (all 8 devices shard the corpus)."""
    q, cand = _corpus(rng, n=50)
    dense = BruteForce().index(cand)
    sharded = ShardedBruteForce(mesh_model8).index(cand)
    ds, di = dense(q, k=10)
    ss, si = sharded(q, k=10)
    np.testing.assert_allclose(np.asarray(ss), np.asarray(ds), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(di))


# Default tier on purpose (ADVICE r4): these two are the ONLY coverage of
# the sharded index's identifier mapping and checkpoint paths; they are
# small-n and cheap relative to the mesh-parity compiles.
def test_sharded_brute_force_identifiers(mesh, rng):
    q, cand = _corpus(rng, n=60)
    int_ids = rng.permutation(60).astype(np.int64) + 1000
    str_ids = np.array([f"movie_{j}" for j in int_ids])
    dense_i = BruteForce().index(cand, int_ids)
    shard_i = ShardedBruteForce(mesh).index(cand, int_ids)
    _, d_ids = dense_i(q, k=9)
    _, s_ids = shard_i(q, k=9)
    np.testing.assert_array_equal(np.asarray(s_ids), np.asarray(d_ids))
    dense_s = BruteForce().index(cand, str_ids)
    shard_s = ShardedBruteForce(mesh).index(cand, str_ids)
    _, d_sids = dense_s(q, k=9)
    _, s_sids = shard_s(q, k=9)
    np.testing.assert_array_equal(s_sids, d_sids)


def test_sharded_brute_force_query_with_exclusions(mesh, rng):
    q, cand = _corpus(rng, n=60)
    excl = rng.integers(0, 60, (q.shape[0], 3)).astype(np.int32)
    dense = BruteForce().index(cand)
    sharded = ShardedBruteForce(mesh).index(cand)
    ds, di = dense.query_with_exclusions(q, excl, k=10)
    ss, si = sharded.query_with_exclusions(q, excl, k=10)
    np.testing.assert_allclose(np.asarray(ss), np.asarray(ds), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(di))


def test_sharded_brute_force_query_model(mesh, rng):
    q, cand = _corpus(rng, n=40)
    w = jnp.asarray(rng.normal(size=(16, 16)).astype(np.float32))
    qm = lambda x: x @ w  # noqa: E731
    dense = BruteForce(query_model=qm).index(cand)
    sharded = ShardedBruteForce(mesh, query_model=qm).index(cand)
    ds, di = dense(q, k=5)
    ss, si = sharded(q, k=5)
    np.testing.assert_allclose(np.asarray(ss), np.asarray(ds), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(di))


def test_sharded_brute_force_k_exceeds_corpus(mesh, rng):
    """k > corpus size: valid rows first, -inf/-1 sentinels after."""
    q, cand = _corpus(rng, n=6)
    s, i = ShardedBruteForce(mesh).index(cand)(q, k=10)
    ref_s, ref_i = jax.lax.top_k(jnp.asarray(q) @ cand.T, 6)
    np.testing.assert_allclose(
        np.asarray(s)[:, :6], np.asarray(ref_s), rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(i)[:, :6], np.asarray(ref_i))
    assert np.all(np.isneginf(np.asarray(s)[:, 6:]))
    assert np.all(np.asarray(i)[:, 6:] == -1)


def test_factorized_top_k_metric_sharded_equals_dense(mesh, rng):
    """The metric bank fed by the sharded index == fed by BruteForce."""
    q, cand = _corpus(rng, n=200)
    true_idx = rng.integers(0, 200, q.shape[0])
    true_c = cand[true_idx]
    m_dense = FactorizedTopK(index=BruteForce().index(cand))
    m_shard = FactorizedTopK(index=ShardedBruteForce(mesh).index(cand))
    out_d = m_dense.compute(m_dense.update(m_dense.init(), q, true_c))
    out_s = m_shard.compute(m_shard.update(m_shard.init(), q, true_c))
    for key in out_d:
        np.testing.assert_allclose(
            float(out_s[key]), float(out_d[key]), rtol=1e-6
        )
    # Sanity: top_1 <= top_5 <= ... <= top_100 == 1 (k=100 covers half the
    # 200-row corpus; with random data hits are monotone in k).
    accs = [float(out_s[f"top_{k}_categorical_accuracy"])
            for k in (1, 5, 10, 50, 100)]
    assert accs == sorted(accs)


def test_sharded_brute_force_save_load_round_trip(mesh, rng, tmp_path):
    q, cand = _corpus(rng, n=60)
    ids = np.arange(60, dtype=np.int64) * 3
    idx = ShardedBruteForce(mesh).index(cand, ids)
    path = save_index(os.path.join(tmp_path, "sbf"), idx)
    restored = load_index(path, mesh=mesh)
    assert isinstance(restored, ShardedBruteForce)
    s0, i0 = idx(q, k=8)
    s1, i1 = restored(q, k=8)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
