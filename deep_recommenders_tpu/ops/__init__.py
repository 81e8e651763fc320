from deep_recommenders_tpu.ops.cin import cin_interaction
from deep_recommenders_tpu.ops.dice import dice
from deep_recommenders_tpu.ops.fm import fm_interaction, fm_interaction_pallas
from deep_recommenders_tpu.ops.retrieval import (
    hard_negative_mining,
    in_batch_retrieval_loss,
    remove_accidental_negatives,
    sampling_probability_correction,
)
from deep_recommenders_tpu.ops.topk import (
    chunked_top_k,
    exclude,
    merge_top_k,
    top_k_scores,
)
