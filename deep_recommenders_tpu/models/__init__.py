from deep_recommenders_tpu.models import multitask, ranking, retrieval
from deep_recommenders_tpu.models.common import MLP
