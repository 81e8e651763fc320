from deep_recommenders_tpu.models.nlp.attention import (
    MultiHeadAttention,
    TokenEmbedding,
)
from deep_recommenders_tpu.models.nlp.transformer import (
    DecoderLayer,
    EncoderLayer,
    PositionWiseFeedForward,
    Transformer,
    noam_schedule,
    position_encoding,
)
