"""Pluggable eval programs for the Trainer: the model.compile(metrics=...)
analog (ref keras examples compile AUC/P/R; MMoE example reports per-task
MSE, ref examples/train_mmoe_on_synthetic_estimator.py:44-51; two-tower
evals with the FactorizedTopK bank, ref factorized_top_k.py:475-480).

An eval program is three methods:
- ``init()``   -> metric-state pytree (device arrays)
- ``update(params, batch, labels, state)`` -> new state, jit-safe (runs
  INSIDE the jitted eval step / the device-resident eval scan)
- ``compute(state)`` -> {name: float} epoch summary (host side)

The Trainer defaults to ``BinaryCTREval`` (sigmoid + BCE + AUC/P/R — the
reference's CTR config); MMoE/ESMM pass ``MultiTaskMSEEval`` /
``MultiTaskBCEEval``, two-tower passes ``RetrievalEval`` — so every model
family shares fit/fit_device's checkpoint/resume, early stopping, and the
one-dispatch-per-epoch scan.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from deep_recommenders_tpu.training import metrics as metrics_lib
from deep_recommenders_tpu.training.losses import (
    binary_cross_entropy,
    mean_squared_error,
)


class BinaryCTREval:
    """AUC + precision/recall + BCE val_loss on sigmoid(logits)."""

    def __init__(self, model, auc: Optional[metrics_lib.AUC] = None,
                 pr: Optional[metrics_lib.PrecisionRecall] = None):
        self.model = model
        self.auc = auc or metrics_lib.AUC()
        self.pr = pr or metrics_lib.PrecisionRecall()

    def init(self):
        return {
            "auc": self.auc.init(),
            "pr": self.pr.init(),
            "loss": metrics_lib.Mean.init(),
        }

    def update(self, params, batch, labels, state):
        logits = self.model.apply(params, batch, training=False)
        probs = jax.nn.sigmoid(logits)
        loss = binary_cross_entropy(logits, labels)
        return {
            "auc": self.auc.update(state["auc"], labels, probs),
            "pr": self.pr.update(state["pr"], labels, probs),
            "loss": metrics_lib.Mean.update(state["loss"], loss),
        }

    def compute(self, state) -> Dict[str, float]:
        pr = self.pr.compute(state["pr"])
        return {
            "auc": float(self.auc.compute(state["auc"])),
            "precision": float(pr["precision"]),
            "recall": float(pr["recall"]),
            "val_loss": float(metrics_lib.Mean.compute(state["loss"])),
        }


class MultiTaskMSEEval:
    """Per-task MSE for multi-output regressors (MMoE on the synthetic
    two-task benchmark; ref train_mmoe_on_synthetic_estimator.py:48-51).

    ``labels``: (B, num_tasks) — task t's target in column t.
    Summary: ``mse_0..mse_{T-1}`` + ``val_loss`` (their sum).
    """

    def __init__(self, model, num_tasks: int = 2):
        self.model = model
        self.num_tasks = num_tasks

    def init(self):
        return {
            f"mse_{t}": metrics_lib.Mean.init()
            for t in range(self.num_tasks)
        }

    def update(self, params, batch, labels, state):
        outputs = self.model.apply(params, batch, training=False)
        new = {}
        for t in range(self.num_tasks):
            err = (outputs[t].reshape(-1) - labels[:, t]) ** 2
            new[f"mse_{t}"] = metrics_lib.Mean.update(
                state[f"mse_{t}"], err
            )
        return new

    def compute(self, state) -> Dict[str, float]:
        out = {
            f"mse_{t}": float(
                metrics_lib.Mean.compute(state[f"mse_{t}"])
            )
            for t in range(self.num_tasks)
        }
        out["val_loss"] = sum(out.values())
        return out


class MultiTaskBCEEval:
    """Per-task AUC + BCE for multi-label sigmoid models (ESMM's pCTR /
    pCTCVR heads, ref estimator/models/multi_task_learning/esmm.py:53-55).

    The model must return a sequence of per-task PROBABILITIES (ESMM
    multiplies sigmoids, so its outputs are probs, not logits);
    ``labels``: (B, num_tasks). ``output_indices`` maps label column t to
    the model output it scores — ESMM returns (p_cvr, p_ctr, p_ctcvr) but
    trains on (ctr, ctcvr) labels, so it passes ``(1, 2)``.
    """

    def __init__(self, model, num_tasks: int = 2,
                 task_names: Optional[Tuple[str, ...]] = None,
                 output_indices: Optional[Tuple[int, ...]] = None):
        self.model = model
        self.num_tasks = num_tasks
        self.names = tuple(task_names or
                           (f"task_{t}" for t in range(num_tasks)))
        self.output_indices = tuple(output_indices or range(num_tasks))
        self.auc = metrics_lib.AUC()

    def init(self):
        state = {}
        for name in self.names:
            state[f"auc_{name}"] = self.auc.init()
            state[f"loss_{name}"] = metrics_lib.Mean.init()
        return state

    def update(self, params, batch, labels, state):
        probs = self.model.apply(params, batch, training=False)
        new = {}
        for t, name in enumerate(self.names):
            p = probs[self.output_indices[t]].reshape(-1)
            y = labels[:, t]
            new[f"auc_{name}"] = self.auc.update(
                state[f"auc_{name}"], y, p
            )
            eps = 1e-7
            bce = -(y * jnp.log(p + eps) + (1 - y) * jnp.log(1 - p + eps))
            new[f"loss_{name}"] = metrics_lib.Mean.update(
                state[f"loss_{name}"], bce
            )
        return new

    def compute(self, state) -> Dict[str, float]:
        out = {}
        total = 0.0
        for name in self.names:
            out[f"auc_{name}"] = float(
                self.auc.compute(state[f"auc_{name}"])
            )
            loss = float(metrics_lib.Mean.compute(state[f"loss_{name}"]))
            out[f"loss_{name}"] = loss
            total += loss
        out["val_loss"] = total
        return out


class RetrievalEval:
    """Two-tower eval: per-example retrieval loss + the in-batch
    FactorizedTopK accuracy bank (ref sbcnm.py:156-163 wires the metric
    into the loss path; here it rides the jitted eval step).

    ``batch``: (query_batch, candidate_batch) tuple, or one dict feeding
    both towers. Full-corpus recall@k (against an index) stays a separate
    offline pass — see benchmarks/two_tower_quality.py — because the corpus
    embedding changes with the params and is rebuilt per evaluation.
    """

    def __init__(self, model, task=None, metric=None):
        from deep_recommenders_tpu.models.retrieval import (
            FactorizedTopK,
            Retrieval,
        )

        self.model = model
        task = task or Retrieval()
        # Eval always scores the plain (single-device-semantics) loss over
        # the eval batch; metric/mesh/axis config — and accidental-negative
        # removal, whose candidate ids update() doesn't thread — are
        # training concerns.
        self._loss_task = dataclasses.replace(
            task, metrics=None, axis_name=None, mesh=None,
            remove_accidental_negatives=False,
        )
        self.metric = metric or FactorizedTopK()

    def init(self):
        return {
            "loss": metrics_lib.Mean.init(),
            "topk": self.metric.init(),
        }

    def update(self, params, batch, labels, state):
        del labels
        qb, cb = batch if isinstance(batch, tuple) else (batch, batch)
        qe, ce = self.model.apply(params, qb, cb, training=False)
        loss_sum = self._loss_task(qe, ce)
        b = qe.shape[0]
        return {
            "loss": metrics_lib.Mean.update(
                state["loss"], jnp.full((b,), loss_sum / b)
            ),
            "topk": self.metric.update(state["topk"], qe, ce),
        }

    def compute(self, state) -> Dict[str, float]:
        out = {
            k: float(v)
            for k, v in self.metric.compute(state["topk"]).items()
        }
        out["val_loss"] = float(metrics_lib.Mean.compute(state["loss"]))
        return out


def multitask_mse_loss(model, num_tasks: int = 2):
    """Summed per-task MSE train loss for Trainer(loss_fn=...) — the MMoE
    example's two minimize() calls collapsed into one update (the ref's
    double-global_step-bump quirk is not replicated, SURVEY fidelity notes).
    """

    def loss_fn(params, batch, labels, rngs=None):
        outputs = model.apply(params, batch, training=True, rngs=rngs)
        return sum(
            mean_squared_error(outputs[t], labels[:, t : t + 1])
            for t in range(num_tasks)
        )

    return loss_fn


def retrieval_loss(model, task):
    """Two-tower train loss for Trainer(loss_fn=...): ``batch`` is the
    (query_batch, candidate_batch) tuple (or one dict for both towers).

    ``labels`` may be:
    - None — plain in-batch softmax;
    - an id array — candidate ids (accidental-negative removal when the
      task enables it);
    - a dict with optional keys ``candidate_ids`` and ``sampling_prob`` —
      the latter is each positive's corpus sampling probability for the
      logQ correction (ref sbcnm.py:78-86). On popularity-skewed corpora
      BOTH matter: a 2-3%-popular movie shows up dozens of times per 1024
      batch as a false negative of itself, and uncorrected in-batch softmax
      learns popularity-cancelled (PMI) scores that rank the full corpus
      near-randomly.
    """

    def loss_fn(params, batch, labels, rngs=None):
        qb, cb = batch if isinstance(batch, tuple) else (batch, batch)
        qe, ce = model.apply(params, qb, cb, training=True, rngs=rngs)
        if isinstance(labels, dict):
            return task(
                qe, ce,
                candidate_ids=labels.get("candidate_ids"),
                candidate_sampling_probability=labels.get("sampling_prob"),
            )
        return task(qe, ce, candidate_ids=labels)

    return loss_fn
