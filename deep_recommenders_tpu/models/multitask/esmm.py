"""ESMM: entire-space multi-task CTCVR model.

Parity: ref deep_recommenders/estimator/models/multi_task_learning/esmm.py:
12-55 — shared input, two parallel towers producing pCVR and pCTR, and
pCTCVR = pCTR * pCVR. Returns (p_cvr, p_ctr, p_ctcvr), each (B, 1), as
probabilities (the product structure requires prob space; towers apply
sigmoid internally).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax

from deep_recommenders_tpu.models.common import MLP


class ESMM(nn.Module):
    cvr_hidden: Tuple[int, ...] = (256, 128)
    ctr_hidden: Tuple[int, ...] = (256, 128)

    @nn.compact
    def __call__(
        self, x: jax.Array, training: bool = False
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        cvr_logit = MLP(self.cvr_hidden, output_dim=1, name="cvr_tower")(
            x, training=training
        )
        ctr_logit = MLP(self.ctr_hidden, output_dim=1, name="ctr_tower")(
            x, training=training
        )
        p_cvr = jax.nn.sigmoid(cvr_logit)
        p_ctr = jax.nn.sigmoid(ctr_logit)
        return p_cvr, p_ctr, p_ctr * p_cvr
