from deep_recommenders_tpu.models.multitask.esmm import ESMM
from deep_recommenders_tpu.models.multitask.mmoe import MMoE
