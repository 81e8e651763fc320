import numpy as np
import pytest

from deep_recommenders_tpu.datasets import (
    Cora,
    MovielensRanking,
    SyntheticForMultiTask,
    synthesize_ml1m,
)
from deep_recommenders_tpu.datasets.movielens import MAX_GENRES


def make_small_ranking(batch_size=64):
    return MovielensRanking(
        batch_size=batch_size, num_ratings=2000, seed=7
    )


def test_synthetic_corpus_schema():
    raw = synthesize_ml1m(num_ratings=500, seed=3)
    assert len(raw["UserID"]) == 500
    assert set(raw["Rating"]) <= {1, 2, 3, 4, 5}
    # Deterministic.
    raw2 = synthesize_ml1m(num_ratings=500, seed=3)
    np.testing.assert_array_equal(raw["Rating"], raw2["Rating"])
    # Label balance is ml-1m-like (~57% positive), not degenerate.
    pos = (raw["Rating"] > 3).mean()
    assert 0.4 < pos < 0.7


def test_ranking_batches_shapes_and_split():
    ds = make_small_ranking(batch_size=64)
    # Split arithmetic: fixed 0.8/0.2 over examples (no epoch leakage).
    assert ds.train_steps_per_epoch == int(2000 * 0.8) // 64
    assert ds.test_steps == (2000 - int(2000 * 0.8)) // 64
    batches = list(ds.train_batches(epochs=1))
    assert len(batches) == ds.train_steps_per_epoch
    feats, label = batches[0]
    assert feats["user_id"].shape == (64,)
    assert feats["movie_genres"].shape == (64, MAX_GENRES)
    assert feats["movie_genres__wt"].shape == (64, MAX_GENRES)
    assert label.shape == (64, 1)
    assert set(np.unique(label)) <= {0.0, 1.0}
    # Test batches don't overlap train rows: labels differ run to run there.
    test_feats, _ = next(iter(ds.test_batches()))
    assert test_feats["user_id"].shape == (64,)


def test_ranking_epochs_reshuffle():
    ds = make_small_ranking()
    e1 = [f["user_id"] for f, _ in ds.train_batches(1, shuffle_seed=1)]
    e2 = [f["user_id"] for f, _ in ds.train_batches(1, shuffle_seed=2)]
    assert not np.array_equal(np.concatenate(e1), np.concatenate(e2))
    # Same multiset of rows.
    assert sorted(np.concatenate(e1)) == sorted(np.concatenate(e2))


def test_synthetic_multitask_contract():
    ds = SyntheticForMultiTask(num_examples=256, example_dim=16, p=0.8)
    feats, labels = next(iter(ds.batches(batch_size=128)))
    assert feats["features"].shape == (128, 16)
    assert set(labels) == {"labels0", "labels1"}
    assert labels["labels0"].shape == (128, 1)
    cols = ds.column_view(feats["features"])
    assert len(cols) == 16 and cols["C3"].shape == (128, 1)
    # Task correlation increases with p (MMoE paper property).
    hi = SyntheticForMultiTask(512, 16, p=0.95, seed=1)
    lo = SyntheticForMultiTask(512, 16, p=0.05, seed=1)

    def corr(d):
        f, l = next(iter(d.batches(batch_size=512)))
        return abs(np.corrcoef(l["labels0"][:, 0], l["labels1"][:, 0])[0, 1])

    assert corr(hi) > corr(lo)


def test_cora_contract():
    cora = Cora(synthetic_nodes=200, synthetic_features=70, seed=5)
    n = cora.features.shape[0]
    assert n == 200 and cora.features.shape[1] == 70
    # Row-normalized features.
    sums = cora.features.sum(1)
    np.testing.assert_allclose(sums[sums > 0], 1.0, rtol=1e-5)
    # Symmetric adjacency, normalized spectral form.
    np.testing.assert_array_equal(cora.adjacency, cora.adjacency.T)
    assert cora.spectral_adjacency.shape == (n, n)
    splits = cora.splits(num_per_class=5, num_valid=50)
    train_labels, train_mask = splits["train"]
    assert train_mask.sum() <= 5 * cora.num_classes
    assert train_labels.shape == (n, cora.num_classes)
    # Masks are disjoint and cover all nodes.
    total = (
        splits["train"][1].astype(int)
        + splits["valid"][1].astype(int)
        + splits["test"][1].astype(int)
    )
    assert total.max() == 1 and total.sum() == n


def test_corpus_ten_column_contract(tmp_path):
    """Full reference-schema parity: all 10 columns (ref movielens.py:116-125)
    present, typed, and round-tripping through the offline corpus artifact
    (serialize_tfrecords analog, ref movielens.py:65-93)."""
    from deep_recommenders_tpu.datasets import (
        CORPUS_COLUMNS,
        read_corpus,
        serialize_corpus,
    )

    raw = synthesize_ml1m(num_ratings=300, seed=5)
    assert set(CORPUS_COLUMNS) <= set(raw)
    n = len(raw["UserID"])
    for c in CORPUS_COLUMNS:
        assert len(raw[c]) == n, c
    for c in ("Rating", "Timestamp", "Age", "Occupation"):
        assert np.issubdtype(np.asarray(raw[c]).dtype, np.integer), c
    for c in ("UserID", "MovieID", "Gender", "Zip-code", "Title"):
        assert isinstance(raw[c][0], str), c
    assert all(len(z) == 5 for z in raw["Zip-code"][:20])
    assert isinstance(raw["Genres"][0], tuple)

    path = serialize_corpus(raw, str(tmp_path / "corpus.npz"))
    back = read_corpus(path)
    assert set(back) == set(CORPUS_COLUMNS)
    np.testing.assert_array_equal(
        back["Rating"], np.asarray(raw["Rating"], np.int64)
    )
    assert list(back["Title"]) == list(raw["Title"])
    assert list(back["Zip-code"]) == list(raw["Zip-code"])
    assert [tuple(g) for g in back["Genres"]] == [
        tuple(g) for g in raw["Genres"]
    ]


def test_ranking_from_corpus_artifact(tmp_path):
    """MovielensRanking consumes a serialized corpus identically to the
    in-memory raw columns (the reference's TFRecord-then-parse flow)."""
    from deep_recommenders_tpu.datasets import serialize_corpus, synthesize_ml1m

    raw = synthesize_ml1m(num_ratings=2000, seed=7)
    path = serialize_corpus(raw, str(tmp_path / "c.npz"))
    direct = MovielensRanking(
        batch_size=64, num_ratings=2000, seed=7, cache_dir=None
    )
    via_corpus = MovielensRanking(
        batch_size=64, corpus_path=path, seed=7, cache_dir=None
    )
    (fd, ld) = next(iter(direct.train_batches()))
    (fc, lc) = next(iter(via_corpus.train_batches()))
    np.testing.assert_array_equal(ld, lc)
    for k in fd:
        np.testing.assert_array_equal(fd[k], fc[k])


def _network_available(host="files.grouplens.org", port=443, timeout=2.0):
    import socket

    try:
        socket.create_connection((host, port), timeout=timeout).close()
        return True
    except OSError:
        return False


def test_download_ml1m_real_corpus(tmp_path):
    """Real-network ETL entry point (ref movielens.py:8-16). Offline (this
    sandbox) the download must raise OSError — the documented signal for
    callers to fall back to synthesize_ml1m — so both sides of the contract
    are exercised wherever the test runs."""
    from deep_recommenders_tpu.datasets import download_ml1m, load_ml1m

    if not _network_available():
        with pytest.raises(OSError):
            download_ml1m(str(tmp_path), timeout=2.0)
        pytest.skip("network unreachable: exercised the offline contract")
    out = download_ml1m(str(tmp_path))
    data = load_ml1m(out)
    assert len(data["rating"]) == 1_000_209


def test_download_cora_real_corpus(tmp_path):
    from deep_recommenders_tpu.datasets import Cora, download_cora

    if not _network_available("linqs-data.soe.ucsc.edu"):
        with pytest.raises(OSError):
            download_cora(str(tmp_path), timeout=2.0)
        pytest.skip("network unreachable: exercised the offline contract")
    root = download_cora(str(tmp_path))
    cora = Cora(path=root)
    assert cora.features.shape[0] == 2708
