from deep_recommenders_tpu.embedding.engine import (
    EmbeddingCollection,
    LinearTerms,
)
