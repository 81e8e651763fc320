from deep_recommenders_tpu.models.ranking.dcn import DCN, Cross
from deep_recommenders_tpu.models.ranking.deepfm import DeepFM
from deep_recommenders_tpu.models.ranking.din import (
    DIN,
    ActivationUnit,
    Dice,
    subtract_interacter,
)
from deep_recommenders_tpu.models.ranking.fm import (
    FactorizationMachine,
    FMLayer,
)
from deep_recommenders_tpu.models.ranking.fnn import FNN
from deep_recommenders_tpu.models.ranking.wide_deep import WideDeep
from deep_recommenders_tpu.models.ranking.xdeepfm import CIN, XDeepFM
