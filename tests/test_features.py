import numpy as np
import pytest

from deep_recommenders_tpu.features import (
    CrossedFeature,
    DenseFeature,
    Feature,
    FeatureEncoder,
    WEIGHT_SUFFIX,
    crc32_hash_bucket,
    vocab_lookup,
)


def test_hash_bucket_deterministic_and_in_range():
    values = [f"user{i}" for i in range(1000)]
    a = crc32_hash_bucket(values, 100)
    b = crc32_hash_bucket(values, 100)
    np.testing.assert_array_equal(a, b)
    assert a.min() >= 0 and a.max() < 100
    # Not degenerate: many buckets used.
    assert len(np.unique(a)) > 50


def test_vocab_lookup_oov():
    ids = vocab_lookup(["F", "M", "X", "F"], ["F", "M"])
    np.testing.assert_array_equal(ids, [0, 1, 2, 0])


def test_feature_validation():
    with pytest.raises(ValueError):
        Feature("bad")
    with pytest.raises(ValueError):
        Feature("bad", vocab=("a",), hash_buckets=10)
    with pytest.raises(ValueError):
        Feature("bad", vocab=("a",), combiner="max")


def test_multi_hot_encoding():
    f = Feature("genres", vocab=("A", "B", "C"), max_len=4)
    out = f.encode([("A", "C"), (), ("B", "A", "C", "B", "A")])
    ids, wt = out["genres"], out["genres" + WEIGHT_SUFFIX]
    assert ids.shape == (3, 4) and wt.shape == (3, 4)
    np.testing.assert_array_equal(ids[0], [0, 2, 0, 0])
    np.testing.assert_array_equal(wt[0], [1, 1, 0, 0])
    np.testing.assert_array_equal(wt[1], [0, 0, 0, 0])
    np.testing.assert_array_equal(wt[2], [1, 1, 1, 1])  # truncated to max_len


def test_crossed_feature():
    cf = CrossedFeature("gxa", keys=("g", "a"), hash_buckets=50)
    enc = FeatureEncoder([cf])
    out = enc.encode({"g": ["F", "M", "F"], "a": [1, 1, 2]})
    assert out["gxa"].shape == (3,)
    # Same raw pair -> same bucket; different pair usually different.
    out2 = enc.encode({"g": ["F"], "a": [1]})
    assert out2["gxa"][0] == out["gxa"][0]


def test_encoder_dense_and_missing():
    enc = FeatureEncoder(
        [Feature("c", vocab=("x", "y")), DenseFeature("d")]
    )
    out = enc.encode({"c": ["x", "z"], "d": [0.5, 1.5]})
    np.testing.assert_array_equal(out["c"], [0, 2])
    np.testing.assert_allclose(out["d"], [0.5, 1.5])
    with pytest.raises(KeyError):
        enc.encode({"c": ["x"]})
