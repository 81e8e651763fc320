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
