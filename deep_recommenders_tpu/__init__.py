"""deep_recommenders_tpu — a TPU-native recommender framework.

A ground-up JAX / XLA / Pallas / pjit re-design with the capabilities of
LongmaoTeamTf/deep_recommenders (reference mounted at /root/reference):

- CTR / ranking stack: FM, WDL, FNN, DeepFM, DCN (CrossNet), xDeepFM (CIN),
  DIN (+ Dice), MMoE, ESMM.
- Retrieval stack: two-tower in-batch sampled-softmax (``Retrieval`` task with
  log-Q correction / accidental-negative removal / hard-negative mining),
  exact factorized top-k (BruteForce / Streaming / sharded), FactorizedTopK
  metric bank, GCN.
- NLP stack: MultiHeadAttention / Transformer with a Pallas blockwise (flash)
  attention kernel.
- TPU-first runtime: device mesh ("data", "model"), sharded embedding engine
  with cross-shard exchange over ICI, jitted train/eval steps, Orbax
  checkpointing with warm-start, pure-JAX streaming metrics.

Unlike the reference (pure-Python TensorFlow, single-process CPU), every
compute path here is designed for the MXU/VPU and the XLA compilation model:
static shapes, batched einsums instead of Python loops, Pallas kernels for the
hot ops, and jax.sharding for scale-out.
"""

__version__ = "0.1.0"

from deep_recommenders_tpu import datasets
from deep_recommenders_tpu import features
from deep_recommenders_tpu import models
from deep_recommenders_tpu import ops
from deep_recommenders_tpu import parallel
from deep_recommenders_tpu import training
