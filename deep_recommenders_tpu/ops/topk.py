"""Exact top-k retrieval primitives: scoring, merge algebra, exclusions.

Parity: ref deep_recommenders/keras/models/retrieval/factorized_top_k.py —
- the (scores, ids) merge reduction of Streaming (ref :215-233): merging two
  top-k states is concat + re-top-k; associative/commutative, so the same
  algebra serves dataset chunks (Streaming), corpus shards (sharded search),
  and tree reductions.
- ``exclude``: top-k with identifier exclusions by additive -1e5 penalty then
  re-top-k (ref :44-67).

TPU notes: scoring is one (B, D) x (D, N) matmul on the MXU; jax.lax.top_k
handles selection. For corpora too big for one matmul, chunk over N and fold
with ``merge_top_k`` inside lax.scan — HBM-bandwidth bound, no host round
trips.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def top_k_scores(
    queries: jax.Array, candidates: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """(B, D) x (N, D) -> top-k (scores, candidate_indices), each (B, k)."""
    scores = jnp.dot(
        queries, candidates.T, preferred_element_type=jnp.float32
    )
    return jax.lax.top_k(scores, k)


def merge_top_k(
    scores_a: jax.Array,
    ids_a: jax.Array,
    scores_b: jax.Array,
    ids_b: jax.Array,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Merge two per-row top-k states (ref factorized_top_k.py:215-233)."""
    scores = jnp.concatenate([scores_a, scores_b], axis=1)
    ids = jnp.concatenate([ids_a, ids_b], axis=1)
    top_scores, idx = jax.lax.top_k(scores, k)
    return top_scores, jnp.take_along_axis(ids, idx, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "chunk_size"))
def chunked_top_k(
    queries: jax.Array,
    candidates: jax.Array,
    k: int,
    chunk_size: int = 4096,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k over a large corpus by scanning candidate chunks.

    The device-resident generalization of the reference's Streaming
    map/merge-reduce over dataset batches (ref :201-260): each chunk is one
    MXU matmul + top_k, folded with the merge algebra in a lax.scan.
    """
    n, d = candidates.shape
    b = queries.shape[0]
    k = min(k, n)
    pad = (-n) % chunk_size
    if pad:
        candidates = jnp.concatenate(
            [candidates, jnp.zeros((pad, d), candidates.dtype)], axis=0
        )
    num_chunks = candidates.shape[0] // chunk_size
    chunks = candidates.reshape(num_chunks, chunk_size, d)

    neg_inf = jnp.float32(-jnp.inf)

    def step(carry, xs):
        best_s, best_i = carry
        chunk, chunk_idx = xs
        scores = jnp.dot(
            queries, chunk.T, preferred_element_type=jnp.float32
        )
        base = chunk_idx * chunk_size
        col = jax.lax.broadcasted_iota(jnp.int32, (b, chunk_size), 1) + base
        # Mask padded rows out.
        scores = jnp.where(col < n, scores, neg_inf)
        s, local_i = jax.lax.top_k(scores, k)
        i = jnp.take_along_axis(col, local_i, axis=1)
        return merge_top_k(best_s, best_i, s, i, k), None

    init = (
        jnp.full((b, k), neg_inf, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
    )
    (scores, indices), _ = jax.lax.scan(
        step, init, (chunks, jnp.arange(num_chunks))
    )
    return scores, indices


def exclude(
    scores: jax.Array,
    identifiers: jax.Array,
    exclusions: jax.Array,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k of ``scores`` excluding per-row identifier lists.

    ref factorized_top_k.py:44-67: build an isin mask of identifiers (B, N)
    vs exclusions (B, E), add -1e5 to masked scores, re-top-k.
    """
    idents = identifiers
    if idents.ndim == 1:
        idents = jnp.broadcast_to(
            idents[None, :], (scores.shape[0], idents.shape[0])
        )
    isin = jnp.any(
        idents[:, :, None] == exclusions[:, None, :], axis=-1
    )
    adjusted = scores + isin.astype(scores.dtype) * -1e5
    top_scores, idx = jax.lax.top_k(adjusted, k)
    return top_scores, jnp.take_along_axis(idents, idx, axis=1)
