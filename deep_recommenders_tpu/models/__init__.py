from deep_recommenders_tpu.models import multitask, ranking
from deep_recommenders_tpu.models.common import MLP
