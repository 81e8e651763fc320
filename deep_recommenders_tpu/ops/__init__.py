from deep_recommenders_tpu.ops.cin import cin_interaction
from deep_recommenders_tpu.ops.dice import dice
from deep_recommenders_tpu.ops.fm import fm_interaction, fm_interaction_pallas
