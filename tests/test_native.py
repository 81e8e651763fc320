"""Native ETL kernel tests: build, bit-equivalence with Python fallbacks."""

import zlib

import numpy as np
import pytest

from deep_recommenders_tpu import native


def test_native_builds():
    assert native.available(), "g++ build of fastetl.cpp failed"


def test_crc32_bucket_matches_python(rng):
    values = [f"user{i}" for i in range(2000)] + ["", "x", "日本語"]
    got = native.crc32_bucket(values, 997)
    expected = np.asarray(
        [zlib.crc32(str(v).encode("utf-8")) % 997 for v in values], np.int32
    )
    np.testing.assert_array_equal(got, expected)


def test_crc32_bucket_via_feature_path(rng):
    """Large encode batches route through native and stay bit-identical."""
    from deep_recommenders_tpu.features import crc32_hash_bucket

    values = [str(i * 7919) for i in range(5000)]
    large = crc32_hash_bucket(values, 1000)  # native path (>512)
    small = np.concatenate(
        [crc32_hash_bucket(values[i : i + 100], 1000)
         for i in range(0, 5000, 100)]
    )  # python path (<=512 per call)
    np.testing.assert_array_equal(large, small)


def test_parse_ml1m_ratings(tmp_path):
    path = tmp_path / "ratings.dat"
    rows = [(1, 1193, 5, 978300760), (2, 661, 3, 978302109),
            (6040, 3952, 1, 956715648)]
    path.write_text("".join(f"{a}::{b}::{c}::{d}\n" for a, b, c, d in rows))
    parsed = native.parse_ml1m_ratings(str(path))
    assert parsed is not None
    uid, mid, rating, ts = parsed
    np.testing.assert_array_equal(uid, [1, 2, 6040])
    np.testing.assert_array_equal(mid, [1193, 661, 3952])
    np.testing.assert_array_equal(rating, [5, 3, 1])
    np.testing.assert_array_equal(ts, [978300760, 978302109, 956715648])


def test_pack_bags_matches_fallback(rng):
    flat = rng.integers(0, 100, 50).astype(np.int32)
    offsets = np.asarray([0, 3, 3, 10, 50], np.int64)
    ids_n, wt_n = native.pack_bags(flat, offsets, max_len=6)
    # Forced fallback comparison.
    n_rows = 4
    ids_p = np.zeros((n_rows, 6), np.int32)
    wt_p = np.zeros((n_rows, 6), np.float32)
    for r in range(n_rows):
        lo = offsets[r]
        hi = min(offsets[r + 1], lo + 6)
        ids_p[r, : hi - lo] = flat[lo:hi]
        wt_p[r, : hi - lo] = 1.0
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(wt_n, wt_p)


def test_end_to_end_ml1m_load(tmp_path):
    """Full load_ml1m over a tiny fabricated ml-1m directory, native parse."""
    d = tmp_path / "ml-1m"
    d.mkdir()
    (d / "users.dat").write_text(
        "1::F::1::10::48067\n2::M::56::16::70072\n"
    )
    (d / "movies.dat").write_text(
        "10::Movie A (1995)::Animation|Comedy\n"
        "20::Movie B (1995)::Drama\n"
    )
    (d / "ratings.dat").write_text(
        "1::10::5::978300760\n2::20::2::978302109\n1::20::4::978301968\n"
    )
    from deep_recommenders_tpu.datasets import load_ml1m

    raw = load_ml1m(str(d), seed=0)
    assert len(raw["UserID"]) == 3
    assert set(raw["Rating"]) == {5, 2, 4}
    assert set(raw["Gender"]) == {"F", "M"}
    # Genres preserved as tuples.
    genre_sets = {tuple(g) for g in raw["Genres"]}
    assert ("Animation", "Comedy") in genre_sets


# --- NativeStreamLoader (C++ background prefetch, loader.cpp) ---------------

def _corpus(rng, n=1000):
    feats = {
        "row_id": np.arange(n, dtype=np.int32),  # unique key per row
        "x": rng.normal(0, 1, (n, 4)).astype(np.float32),
        "bag": rng.integers(0, 9, (n, 3)).astype(np.int32),
    }
    labels = rng.random((n, 1)).astype(np.float32)
    return feats, labels


def test_stream_loader_sequential_matches_corpus(rng):
    from deep_recommenders_tpu.native import NativeStreamLoader

    feats, labels = _corpus(rng)
    loader = NativeStreamLoader(feats, labels, batch_size=128, shuffle=False)
    try:
        got_f, got_l = loader.next_batch()
        np.testing.assert_array_equal(got_f["row_id"], np.arange(128))
        np.testing.assert_allclose(got_f["x"], feats["x"][:128])
        np.testing.assert_allclose(got_l, labels[:128])
        got_f2, _ = loader.next_batch()
        np.testing.assert_array_equal(
            got_f2["row_id"], np.arange(128, 256)
        )
    finally:
        loader.close()


def test_stream_loader_shuffled_epoch_covers_rows(rng):
    from deep_recommenders_tpu.native import NativeStreamLoader

    feats, labels = _corpus(rng, n=512)
    loader = NativeStreamLoader(
        feats, labels, batch_size=64, shuffle=True, seed=7
    )
    try:
        seen = []
        for _ in range(loader.steps_per_epoch):
            f, l = loader.next_batch()
            # row integrity: every column of the batch row matches the
            # corpus row named by row_id (no torn/mixed rows)
            rows = f["row_id"]
            np.testing.assert_allclose(f["x"], feats["x"][rows])
            np.testing.assert_allclose(l, labels[rows])
            seen.append(np.array(rows))  # copy: views are recycled
        seen = np.concatenate(seen)
        # one epoch = a permutation of all rows (512 divisible by 64)
        assert sorted(seen.tolist()) == list(range(512))
        assert not np.array_equal(seen, np.arange(512))  # actually shuffled
        # next epoch: different permutation
        seen2 = []
        for _ in range(loader.steps_per_epoch):
            f, _ = loader.next_batch()
            seen2.append(np.array(f["row_id"]))
        seen2 = np.concatenate(seen2)
        assert sorted(seen2.tolist()) == list(range(512))
        assert not np.array_equal(seen, seen2)
    finally:
        loader.close()


def test_stream_loader_native_is_used():
    """In this environment the toolchain exists; assert the C++ path, so CI
    can't silently regress to the Python fallback."""
    from deep_recommenders_tpu import native
    from deep_recommenders_tpu.native import NativeStreamLoader

    if not native.available():
        import pytest

        pytest.skip("no native toolchain")
    feats = {"a": np.arange(100, dtype=np.int32)}
    loader = NativeStreamLoader(
        feats, np.zeros((100, 1), np.float32), batch_size=10
    )
    try:
        assert loader._handle is not None
    finally:
        loader.close()


def test_stream_loader_feeds_trainer(rng):
    """End-to-end: the C++ prefetch loader drives Trainer.fit."""
    import optax

    from deep_recommenders_tpu.features import Feature
    from deep_recommenders_tpu.models.ranking import FactorizationMachine
    from deep_recommenders_tpu.native import NativeStreamLoader
    from deep_recommenders_tpu.training import Trainer

    n = 256
    feats = {
        "u": rng.integers(0, 20, n).astype(np.int32),
        "m": rng.integers(0, 15, n).astype(np.int32),
    }
    labels = (rng.random((n, 1)) < 0.5).astype(np.float32)
    specs = (Feature("u", hash_buckets=20), Feature("m", hash_buckets=15))
    model = FactorizationMachine(specs, embedding_dim=4)
    trainer = Trainer(model, optax.adam(1e-2), seed=0)
    loader = NativeStreamLoader(feats, labels, batch_size=64, seed=1)
    try:
        out = trainer.fit(loader.epoch_batches, epochs=2, verbose=False)
        assert int(out["state"].step) == 2 * loader.steps_per_epoch
        assert np.isfinite(out["history"][-1]["loss"])
    finally:
        loader.close()
