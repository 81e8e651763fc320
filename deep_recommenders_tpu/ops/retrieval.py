"""Retrieval-loss ops: hard negatives, accidental negatives, log-Q correction.

Parity: ref deep_recommenders/keras/models/retrieval/sbcnm.py:15-86. Note the
reference's Retrieval layer calls these through a nonexistent module path
(``deep_recommenders.keras.layers.embedding.loss.*``, ref sbcnm.py:137-146 —
NameError at runtime, SURVEY §2.4); this module implements the intended
behavior as pure functions.

All ops are shape-static and jit-safe: the "top-k with positives pinned"
trick (add labels * MAX_FLOAT before top_k) and masking by +/- huge floats
translate directly, with jnp.take_along_axis replacing the reference's
hand-rolled flat-gather (ref sbcnm.py:15-30).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_FLOAT = np.finfo(np.float32).max / 100.0
MIN_FLOAT = np.finfo(np.float32).min / 100.0


def hard_negative_mining(
    logits: jax.Array, labels: jax.Array, num_hard_negatives: int
) -> Tuple[jax.Array, jax.Array]:
    """Keep the positive + top-N hardest negatives per row.

    Adding labels * MAX_FLOAT before top_k pins the positive into the kept
    set (ref sbcnm.py:41-49). Returns gathered (logits, labels) of width
    min(N + 1, num_candidates).
    """
    num_candidates = logits.shape[1]
    k = min(num_hard_negatives + 1, num_candidates)
    _, indices = jax.lax.top_k(logits + labels * MAX_FLOAT, k)
    return (
        jnp.take_along_axis(logits, indices, axis=1),
        jnp.take_along_axis(labels, indices, axis=1),
    )


def remove_accidental_negatives(
    logits: jax.Array, labels: jax.Array, identifiers: jax.Array
) -> jax.Array:
    """Push logits of in-batch negatives that share the positive's identifier
    to -inf (ref sbcnm.py:52-75): duplicate mask minus the label itself,
    scaled by MIN_FLOAT."""
    positive_idx = jnp.argmax(labels, axis=1)  # (B,)
    positive_ids = identifiers[positive_idx]  # (B,)
    duplicate = (
        positive_ids[:, None] == identifiers[None, :]
    ).astype(labels.dtype)
    duplicate = duplicate - labels
    return logits + duplicate * MIN_FLOAT


def sampling_probability_correction(
    logits: jax.Array, candidate_sampling_probability: jax.Array
) -> jax.Array:
    """log-Q correction: logits - log(p) (ref sbcnm.py:78-86), with p clamped
    away from zero for numerical safety."""
    p = jnp.maximum(candidate_sampling_probability, 1e-12)
    return logits - jnp.log(p)


def in_batch_retrieval_loss(
    query_embeddings: jax.Array,
    candidate_embeddings: jax.Array,
    sample_weight: Optional[jax.Array] = None,
    candidate_sampling_probability: Optional[jax.Array] = None,
    candidate_ids: Optional[jax.Array] = None,
    num_hard_negatives: Optional[int] = None,
    temperature: Optional[float] = None,
    axis_name: Optional[str] = None,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """The two-tower in-batch sampled-softmax loss (ref sbcnm.py:120-151).

    scores = Q C^T over in-batch candidates, labels = eye, optional log-Q
    correction / accidental-negative removal / hard-negative mining /
    temperature, then softmax CE with SUM reduction.

    ``axis_name``: if set (inside shard_map/pmap over the data axis),
    candidates are all-gathered across that axis so every query scores
    against the POD-WIDE batch of negatives — the reference's
    labels = eye(B) generalizes to an offset identity over the global batch.

    ``compute_dtype``: dtype for the (B, N) score matmul operands
    (softmax statistics and the loss stay fp32). bfloat16 quadruples the
    MXU rate of the K=D contraction — measured 74.8 -> ~19 us at
    B=N=4096, D=32 — at ~1e-2 logit rounding, the same mixed-precision
    contract as the model zoo.
    """
    if axis_name is not None:
        # (S, B, D) -> (S*B, D) global candidate pool; our positives sit at
        # offset shard_index * B.
        gathered = jax.lax.all_gather(candidate_embeddings, axis_name)
        num_shards, local_b = gathered.shape[0], gathered.shape[1]
        candidates = gathered.reshape(num_shards * local_b, -1)
        shard = jax.lax.axis_index(axis_name)
        offset = shard * local_b
        if candidate_ids is not None:
            candidate_ids = jax.lax.all_gather(
                candidate_ids, axis_name
            ).reshape(-1)
        if candidate_sampling_probability is not None:
            candidate_sampling_probability = jax.lax.all_gather(
                candidate_sampling_probability, axis_name
            ).reshape(-1)
    else:
        candidates = candidate_embeddings
        offset = 0

    if compute_dtype is not None:
        q_mm = query_embeddings.astype(compute_dtype)
        c_mm = candidates.astype(compute_dtype)
    else:
        q_mm, c_mm = query_embeddings, candidates
    scores = jnp.einsum(
        "bd,nd->bn", q_mm, c_mm, preferred_element_type=jnp.float32
    )  # (B, N)
    b, n = scores.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, n), 0)
    labels = (cols == rows + offset).astype(scores.dtype)

    if candidate_sampling_probability is not None:
        scores = sampling_probability_correction(
            scores, candidate_sampling_probability
        )
    if candidate_ids is not None:
        scores = remove_accidental_negatives(scores, labels, candidate_ids)
    if num_hard_negatives is not None:
        scores, labels = hard_negative_mining(
            scores, labels, num_hard_negatives
        )
    if temperature is not None:
        scores = scores / temperature

    if num_hard_negatives is None:
        # Sparse diagonal CE: the label matrix is exactly one-hot at
        # column row+offset, so per-row loss = lse - positive score — no
        # (B, N) labels*logp product pass (exact same math).
        lse = jax.scipy.special.logsumexp(scores, axis=-1)
        pos_col = jnp.arange(b, dtype=jnp.int32) + offset
        pos = jnp.take_along_axis(scores, pos_col[:, None], axis=1)[:, 0]
        per_row = lse - pos
    else:
        logp = jax.nn.log_softmax(scores, axis=-1)
        per_row = -jnp.sum(labels * logp, axis=-1)
    if sample_weight is not None:
        per_row = per_row * sample_weight.reshape(-1)
    return jnp.sum(per_row)


def pod_retrieval_loss(
    query_embeddings: jax.Array,
    candidate_embeddings: jax.Array,
    mesh,
    sample_weight: Optional[jax.Array] = None,
    candidate_sampling_probability: Optional[jax.Array] = None,
    candidate_ids: Optional[jax.Array] = None,
    num_hard_negatives: Optional[int] = None,
    temperature: Optional[float] = None,
    data_axis: str = "data",
    compute_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """Pod-wide in-batch negatives as ONE shard_map over the data axis.

    The trainable multi-chip configuration of the reference's
    labels = eye(B) loss (ref sbcnm.py:129-134 / BASELINE.json north star
    "pod-wide in-batch negatives via all-gather"): embeddings arrive sharded
    over ``data_axis``; inside the shard_map each data shard all-gathers the
    candidate block over ICI (in_batch_retrieval_loss's ``axis_name`` path),
    scores its local queries against the GLOBAL candidate pool, and the
    summed per-shard CE is psum-reduced — numerically identical to the
    single-device loss over the global batch. Differentiable end to end
    (the all_gather transposes to a reduce-scatter of candidate grads).
    """
    from jax.sharding import PartitionSpec as P

    optional = {
        "sample_weight": sample_weight,
        "candidate_sampling_probability": candidate_sampling_probability,
        "candidate_ids": candidate_ids,
    }
    names = [k for k, v in optional.items() if v is not None]
    args = [query_embeddings, candidate_embeddings] + [
        optional[k] for k in names
    ]

    def _fn(*vals):
        kw = dict(zip(names, vals[2:]))
        loss = in_batch_retrieval_loss(
            vals[0],
            vals[1],
            num_hard_negatives=num_hard_negatives,
            temperature=temperature,
            axis_name=data_axis,
            **kw,
        )
        return jax.lax.psum(loss, data_axis)

    in_specs = tuple(
        P(data_axis, *([None] * (jnp.asarray(v).ndim - 1))) for v in args
    )
    return jax.shard_map(
        _fn, mesh=mesh, in_specs=in_specs, out_specs=P()
    )(*args)
