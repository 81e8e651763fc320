from deep_recommenders_tpu.training import losses, metrics, optimizers
from deep_recommenders_tpu.training.evaluation import (
    BinaryCTREval,
    MultiTaskBCEEval,
    MultiTaskMSEEval,
    RetrievalEval,
    multitask_mse_loss,
    retrieval_loss,
)
from deep_recommenders_tpu.training.checkpoints import (
    restore_checkpoint,
    save_checkpoint,
)
from deep_recommenders_tpu.training.data import DeviceData
from deep_recommenders_tpu.training.trainer import TrainState, Trainer, bce_loss
from deep_recommenders_tpu.training.warmstart import warm_start_from
