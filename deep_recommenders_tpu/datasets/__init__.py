from deep_recommenders_tpu.datasets.cora import Cora, download_cora
from deep_recommenders_tpu.datasets.movielens import (
    CORPUS_COLUMNS,
    MovielensRanking,
    default_movielens_features,
    download_ml1m,
    load_ml1m,
    read_corpus,
    serialize_corpus,
    synthesize_ml1m,
)
from deep_recommenders_tpu.datasets.synthetic_multitask import (
    SyntheticForMultiTask,
    synthetic_two_task,
)
from deep_recommenders_tpu.datasets.imdb import SyntheticImdb, load_imdb_npz
