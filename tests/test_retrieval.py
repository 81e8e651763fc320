import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_recommenders_tpu.models.retrieval import (
    BruteForce,
    FactorizedTopK,
    InMemoryStreaming,
    Retrieval,
    Streaming,
    TwoTower,
)
from deep_recommenders_tpu.ops.retrieval import (
    hard_negative_mining,
    in_batch_retrieval_loss,
    remove_accidental_negatives,
    sampling_probability_correction,
)
from deep_recommenders_tpu.features import Feature


def test_hard_negative_mining_keeps_positive_and_topk(rng):
    """Ref tests/keras/test_sbcnm.py:17-41 property test."""
    b, n, num_hard = 6, 20, 4
    logits = jnp.asarray(rng.normal(size=(b, n)).astype(np.float32))
    labels = jnp.asarray(np.eye(b, n, dtype=np.float32))
    out_logits, out_labels = hard_negative_mining(logits, labels, num_hard)
    assert out_logits.shape == (b, num_hard + 1)
    # Positive logit preserved in every row.
    pos_logit = np.asarray((logits * labels).sum(1))
    kept_pos = np.asarray((out_logits * out_labels).sum(1))
    np.testing.assert_allclose(kept_pos, pos_logit, rtol=1e-6)
    # Kept negatives are the top-N negatives.
    ln = np.asarray(logits)
    for i in range(b):
        negatives = np.delete(ln[i], i)
        expected_top = set(np.sort(negatives)[-num_hard:])
        kept = np.asarray(out_logits[i])
        kept_negs = set(kept) - {pos_logit[i]}
        assert kept_negs == expected_top


def test_remove_accidental_negatives(rng):
    """Ref test_sbcnm.py:43-55: positives preserved, duplicates nuked."""
    b = 4
    logits = jnp.asarray(rng.normal(size=(b, b)).astype(np.float32))
    labels = jnp.asarray(np.eye(b, dtype=np.float32))
    # candidate 2 shares identifier with candidate 0.
    ids = jnp.asarray([7, 8, 7, 9])
    out = remove_accidental_negatives(logits, labels, ids)
    out = np.asarray(out)
    # Positives unchanged.
    np.testing.assert_allclose(np.diag(out), np.diag(np.asarray(logits)))
    # Row 0's accidental duplicate (col 2) is pushed to -inf-ish.
    assert out[0, 2] < -1e20
    assert out[2, 0] < -1e20
    # Unrelated entries unchanged.
    np.testing.assert_allclose(out[1, 3], np.asarray(logits)[1, 3])


def test_sampling_probability_correction(rng):
    logits = jnp.asarray(rng.normal(size=(3, 5)).astype(np.float32))
    p = jnp.asarray(rng.random(5).astype(np.float32) * 0.5 + 0.1)
    out = sampling_probability_correction(logits, p)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(logits) - np.log(np.asarray(p)),
        rtol=1e-5,
    )


def test_in_batch_loss_matches_manual_ce(rng):
    q = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    loss = float(in_batch_retrieval_loss(q, c))
    scores = np.asarray(q) @ np.asarray(c).T
    logp = scores - np.log(
        np.exp(scores - scores.max(1, keepdims=True)).sum(1, keepdims=True)
    ) - scores.max(1, keepdims=True)
    manual = -np.diag(logp).sum()
    np.testing.assert_allclose(loss, manual, rtol=1e-4)


def test_pod_wide_negatives_match_global_batch(rng):
    """all-gathered in-batch negatives over the data axis == one big batch."""
    n_dev = 4
    b, d = 4, 8
    q = rng.normal(size=(n_dev * b, d)).astype(np.float32)
    c = rng.normal(size=(n_dev * b, d)).astype(np.float32)
    global_loss = float(in_batch_retrieval_loss(jnp.asarray(q), jnp.asarray(c)))

    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:n_dev]), ("data",))
    sharded = jax.shard_map(
        functools.partial(in_batch_retrieval_loss, axis_name="data"),
        mesh=mesh,
        in_specs=(
            jax.sharding.PartitionSpec("data"),
            jax.sharding.PartitionSpec("data"),
        ),
        out_specs=jax.sharding.PartitionSpec(),
    )
    # Per-shard sums must add up to the global SUM-reduced loss.
    per_shard = jax.shard_map(
        lambda a, b: jnp.reshape(
            in_batch_retrieval_loss(a, b, axis_name="data"), (1,)
        ),
        mesh=mesh,
        in_specs=(
            jax.sharding.PartitionSpec("data"),
            jax.sharding.PartitionSpec("data"),
        ),
        out_specs=jax.sharding.PartitionSpec("data"),
    )(jnp.asarray(q), jnp.asarray(c))
    np.testing.assert_allclose(
        np.asarray(per_shard).sum(), global_loss, rtol=1e-4
    )


def test_brute_force_matches_argsort(rng):
    n, d, b, k = 50, 8, 4, 5
    cands = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(b, d)).astype(np.float32)
    index = BruteForce().index(cands)
    scores, ids = index(queries, k=k)
    expected_scores = queries @ cands.T
    for i in range(b):
        order = np.argsort(-expected_scores[i])[:k]
        np.testing.assert_array_equal(np.asarray(ids[i]), order)
        np.testing.assert_allclose(
            np.asarray(scores[i]), expected_scores[i][order], rtol=1e-5
        )


def test_brute_force_string_identifiers(rng):
    cands = rng.normal(size=(10, 4)).astype(np.float32)
    names = np.asarray([f"movie_{i}" for i in range(10)], dtype=object)
    index = BruteForce().index(cands, names)
    _, ids = index(rng.normal(size=(2, 4)).astype(np.float32), k=3)
    assert ids.shape == (2, 3)
    assert all(str(x).startswith("movie_") for x in ids.ravel())


def test_streaming_matches_brute_force(rng):
    """Metamorphic idiom: chunked/streamed search == one-shot search."""
    n, d, b, k = 97, 8, 3, 7  # non-divisible corpus size
    cands = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(b, d)).astype(np.float32)
    bf_scores, bf_ids = BruteForce().index(cands)(queries, k=k)

    def batches():
        for lo in range(0, n, 20):
            yield cands[lo : lo + 20]

    st_scores, st_ids = Streaming(batches)(queries, k=k)
    np.testing.assert_allclose(
        np.asarray(st_scores), np.asarray(bf_scores), rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(st_ids), np.asarray(bf_ids))

    im_scores, im_ids = InMemoryStreaming(chunk_size=16).index(cands)(
        queries, k=k
    )
    np.testing.assert_allclose(
        np.asarray(im_scores), np.asarray(bf_scores), rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(im_ids), np.asarray(bf_ids))


def test_query_with_exclusions(rng):
    n, d = 20, 4
    cands = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(2, d)).astype(np.float32)
    index = BruteForce().index(cands)
    _, top_ids = index(queries, k=3)
    exclusions = np.asarray(top_ids)[:, :2]  # exclude the top-2 per row
    _, ids = index.query_with_exclusions(queries, jnp.asarray(exclusions), k=3)
    for i in range(2):
        assert not set(np.asarray(ids[i])) & set(exclusions[i])


def test_factorized_topk_metric_matches_manual(rng):
    """Ref test idiom: cross-check against a manual in-top-k computation."""
    b, n, d = 16, 40, 8
    corpus = rng.normal(size=(n, d)).astype(np.float32)
    true_idx = rng.integers(0, n, b)
    q = corpus[true_idx] + rng.normal(size=(b, d)).astype(np.float32) * 0.3
    metric = FactorizedTopK(ks=(1, 5, 10))
    state = metric.init()
    state = metric.update(state, q, corpus[true_idx], candidates=corpus)
    out = metric.compute(state)
    scores = q @ corpus.T
    positive = (q * corpus[true_idx]).sum(1)
    eps = 1e-6 * (1.0 + np.abs(positive[:, None]))
    for i, k in enumerate((1, 5, 10)):
        manual = np.mean((scores > positive[:, None] + eps).sum(1) < k)
        np.testing.assert_allclose(
            float(out[f"top_{k}_categorical_accuracy"]), manual, rtol=1e-6
        )
    # Streaming in two chunks == one shot.
    m2 = FactorizedTopK(ks=(1, 5, 10))
    s2 = m2.init()
    s2 = m2.update(s2, q[:8], corpus[true_idx[:8]], candidates=corpus)
    s2 = m2.update(s2, q[8:], corpus[true_idx[8:]], candidates=corpus)
    out2 = m2.compute(s2)
    for k in (1, 5, 10):
        np.testing.assert_allclose(
            float(out2[f"top_{k}_categorical_accuracy"]),
            float(out[f"top_{k}_categorical_accuracy"]),
        )


def test_two_tower_retrieval_task_trains(rng):
    """Train smoke: two-tower + Retrieval loss learns to rank positives."""
    import optax

    user_specs = (Feature("user_id", hash_buckets=40),)
    item_specs = (Feature("item_id", hash_buckets=30),)
    model = TwoTower(
        user_specs, item_specs, embedding_dim=16, hidden=(32,), output_dim=16
    )
    task = Retrieval(temperature=0.2)

    # Structured interactions: user u prefers item u % 30.
    def make_batch(b=32, seed=0):
        r = np.random.default_rng(seed)
        users = r.integers(0, 40, b).astype(np.int32)
        items = ((users * 7) % 30).astype(np.int32)
        return {"user_id": users}, {"item_id": items}

    qb, cb = make_batch()
    params = model.init(jax.random.PRNGKey(0), qb, cb)
    opt = optax.adam(0.05)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, qb, cb):
        def loss_fn(p):
            qe, ce = model.apply(p, qb, cb)
            return task(qe, ce)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    first_loss = None
    for i in range(60):
        qb, cb = make_batch(seed=i)
        params, opt_state, loss = step(params, opt_state, qb, cb)
        if first_loss is None:
            first_loss = float(loss)
    assert float(loss) < first_loss * 0.7, (first_loss, float(loss))

    # Metric bank on the learned model: recall@10 beats random.
    qb, cb = make_batch(seed=999)
    qe, ce = model.apply(params, qb, cb)
    metric = FactorizedTopK(ks=(1, 10))
    state = metric.update(metric.init(), qe, ce)
    out = metric.compute(state)
    assert float(out["top_10_categorical_accuracy"]) > 10 / 32


def test_retrieval_task_options(rng):
    q = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 6, 8))
    p = jnp.asarray(rng.random(8).astype(np.float32) + 0.1)
    task = Retrieval(
        temperature=0.5,
        num_hard_negatives=3,
        remove_accidental_negatives=True,
    )
    loss = task(
        q, c, candidate_sampling_probability=p, candidate_ids=ids
    )
    assert np.isfinite(float(loss))
    with pytest.raises(ValueError):
        Retrieval(remove_accidental_negatives=True)(q, c)


# --- Index persistence (ref signature property: index survives model
# save/load, tests/keras/test_factorized_top_k.py:37-60) -------------------

@pytest.mark.parametrize("identifiers", [
    None,
    np.arange(100, 164, dtype=np.int64),
    np.array([f"item_{i}" for i in range(64)]),
], ids=["row-ids", "int-ids", "str-ids"])
@pytest.mark.parametrize("make", [
    lambda: BruteForce(),
    lambda: InMemoryStreaming(chunk_size=16),
    lambda: __import__(
        "deep_recommenders_tpu.models.retrieval", fromlist=["ApproxTopK"]
    ).ApproxTopK(normalize=True),
], ids=["BruteForce", "InMemoryStreaming", "ApproxTopK"])
def test_index_save_load_round_trip(tmp_path, rng, make, identifiers):
    from deep_recommenders_tpu.models.retrieval import load_index, save_index

    cands = rng.normal(0, 1, (64, 8)).astype(np.float32)
    q = rng.normal(0, 1, (4, 8)).astype(np.float32)
    idx = make()
    if isinstance(idx, InMemoryStreaming) and identifiers is not None:
        pytest.skip("InMemoryStreaming uses row ids only")
    idx.index(cands, identifiers)
    s0, i0 = idx(q, k=5)

    path = save_index(str(tmp_path / "idx"), idx)
    restored = load_index(path)
    assert type(restored) is type(idx)
    s1, i1 = restored(q, k=5)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-6)
    assert np.array_equal(np.asarray(i0), np.asarray(i1))


def test_ivf_save_load_round_trip_no_retrain(tmp_path, rng):
    """IVF restores its trained quantizer exactly (no k-means re-run)."""
    from deep_recommenders_tpu.models.retrieval import (
        IVF,
        load_index,
        save_index,
    )

    cands = rng.normal(0, 1, (256, 16)).astype(np.float32)
    q = rng.normal(0, 1, (8, 16)).astype(np.float32)
    idx = IVF(nlist=8, nprobe=4, seed=3).index(
        cands, np.arange(1000, 1256, dtype=np.int64)
    )
    s0, i0 = idx(q, k=7)
    path = save_index(str(tmp_path / "ivf"), idx)
    restored = load_index(path)
    np.testing.assert_array_equal(
        np.asarray(idx._centroids), np.asarray(restored._centroids)
    )
    s1, i1 = restored(q, k=7)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-6)
    assert np.array_equal(np.asarray(i0), np.asarray(i1))


def test_index_save_load_with_query_model(tmp_path, rng):
    """query_model is a callable — reattached at load time."""
    from deep_recommenders_tpu.models.retrieval import load_index, save_index

    cands = rng.normal(0, 1, (32, 8)).astype(np.float32)
    q = rng.normal(0, 1, (4, 8)).astype(np.float32)
    qm = lambda x: x * 2.0  # noqa: E731
    idx = BruteForce(query_model=qm).index(cands)
    s0, i0 = idx(q, k=3)
    path = save_index(str(tmp_path / "bfqm"), idx)
    restored = load_index(path, query_model=qm)
    s1, i1 = restored(q, k=3)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-6)
    assert np.array_equal(np.asarray(i0), np.asarray(i1))


def test_streaming_query_model_matches_brute_force(rng):
    """All index families accept a query transform (ref :144, :268, :342):
    Streaming/InMemoryStreaming with query_model == BruteForce with it."""
    n, d, b, k = 53, 6, 4, 5
    w = rng.normal(size=(d, d)).astype(np.float32)
    qm = lambda q: q @ jnp.asarray(w)  # noqa: E731
    cands = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(b, d)).astype(np.float32)
    bf_scores, bf_ids = BruteForce(query_model=qm).index(cands)(queries, k=k)

    def batches():
        for lo in range(0, n, 17):
            yield cands[lo : lo + 17]

    st_scores, st_ids = Streaming(batches, query_model=qm)(queries, k=k)
    np.testing.assert_allclose(
        np.asarray(st_scores), np.asarray(bf_scores), rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(st_ids), np.asarray(bf_ids))

    im = InMemoryStreaming(chunk_size=16, query_model=qm).index(cands)
    im_scores, im_ids = im(queries, k=k)
    np.testing.assert_allclose(
        np.asarray(im_scores), np.asarray(bf_scores), rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(im_ids), np.asarray(bf_ids))


def test_exact_top_k_matches_lax_top_k(rng):
    """Hierarchical wide-row selection is EXACT (any global winner is in
    its block's top-k), including ties, -inf padding, and 3-D batches."""
    from deep_recommenders_tpu.ops.topk import exact_top_k

    for shape, k in [((7, 5000), 100), ((3, 2049), 64), ((2, 4, 3000), 10)]:
        scores = rng.normal(size=shape).astype(np.float32)
        # inject ties and -infs
        scores.flat[:: 97] = 1.5
        scores.flat[1:: 101] = -np.inf
        s = jnp.asarray(scores)
        es, ei = exact_top_k(s, k, block=512)
        ls, li = jax.lax.top_k(s, k)
        np.testing.assert_allclose(np.asarray(es), np.asarray(ls))
        # indices may differ among equal scores; the gathered values match
        np.testing.assert_allclose(
            np.asarray(jnp.take_along_axis(s, ei, axis=-1)),
            np.asarray(ls),
        )


def test_in_batch_loss_sparse_diagonal_matches_dense_labels(rng):
    """The no-hard-negatives fast path (lse - positive) == the dense
    labels*log_softmax formulation, with and without corrections."""
    from deep_recommenders_tpu.ops.retrieval import in_batch_retrieval_loss

    b, d = 32, 8
    q = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 10, b))
    prob = jnp.asarray(rng.random(b).astype(np.float32) + 0.01)

    def dense_ref(scores_adj):
        labels = jnp.eye(b, dtype=scores_adj.dtype)
        logp = jax.nn.log_softmax(scores_adj, axis=-1)
        return float(jnp.sum(-jnp.sum(labels * logp, axis=-1)))

    for kwargs in (
        {},
        {"temperature": 0.2},
        {"candidate_ids": ids, "candidate_sampling_probability": prob},
    ):
        got = float(in_batch_retrieval_loss(q, c, **kwargs))
        # rebuild the adjusted scores the dense way
        from deep_recommenders_tpu.ops.retrieval import (
            remove_accidental_negatives,
            sampling_probability_correction,
        )

        scores = q @ c.T
        if "candidate_sampling_probability" in kwargs:
            scores = sampling_probability_correction(scores, prob)
        if "candidate_ids" in kwargs:
            scores = remove_accidental_negatives(
                scores, jnp.eye(b, dtype=scores.dtype), ids
            )
        if "temperature" in kwargs:
            scores = scores / kwargs["temperature"]
        np.testing.assert_allclose(got, dense_ref(scores), rtol=1e-5)

    # bf16 knob: same loss within mixed-precision tolerance
    l32 = float(in_batch_retrieval_loss(q, c))
    l16 = float(
        in_batch_retrieval_loss(q, c, compute_dtype=jnp.bfloat16)
    )
    assert abs(l32 - l16) / abs(l32) < 2e-2
