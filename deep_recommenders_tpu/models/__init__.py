from deep_recommenders_tpu.models import multitask, nlp, ranking, retrieval
from deep_recommenders_tpu.models.common import MLP
