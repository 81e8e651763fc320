from deep_recommenders_tpu.features.columns import (
    CrossedFeature,
    DenseFeature,
    Feature,
    FeatureEncoder,
    WEIGHT_SUFFIX,
    crc32_hash_bucket,
    vocab_lookup,
)
