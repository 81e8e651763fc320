"""Sparse-feature ingest: the tf.feature_column replacement.

The reference handles sparse features with tf.feature_column metadata resolved
inside the graph (categorical_column_with_hash_bucket /
categorical_column_with_vocabulary_list + indicator/embedding columns; see
reference examples/train_deepfm_on_movielens_estimator.py:11-35). That design
re-does string hashing and vocab lookups on every training step.

TPU-first design: all raw-value -> integer-ID transforms run ONCE on the host
(numpy / C-speed CRC32) when the dataset is materialized, and the device only
ever sees dense, statically-shaped int32 ID tensors:

- single-valued feature  ->  ids  : (B,)        int32
- multi-valued bag       ->  ids  : (B, L) int32, padded
                             "<name>__wt" : (B, L) float32 pad mask/weights

so embedding lookups are pure gathers that XLA can tile and shard. This is the
"sparse-feature ingest -> pre-batched ID tensors" subsystem change called out
in BASELINE.json.

Semantics parity notes:
- Vocab lookup: out-of-vocabulary maps to a dedicated OOV bucket at index
  len(vocab) (the reference's default_value=-1 makes OOV an all-zero
  indicator; a real bucket is strictly more expressive and is documented as a
  deliberate divergence).
- Hash bucketing: deterministic CRC32(bytes) % buckets. The reference uses
  TF's Fingerprint64 — bucket assignment differs but the semantics (stable
  hash, collisions allowed) match. The reference sizes hash spaces at exact
  cardinalities (6040/3952), guaranteeing collisions (SURVEY §2.6); we keep
  that configurable.
"""

from __future__ import annotations

import dataclasses
import zlib
from typing import Dict, Mapping, Optional, Sequence, Tuple, Union

import numpy as np

WEIGHT_SUFFIX = "__wt"


def crc32_hash_bucket(values: Sequence, num_buckets: int) -> np.ndarray:
    """Deterministic hash bucketing of arbitrary values (via str encoding).

    Large batches route through the native C++ kernel (native/fastetl.cpp)
    when built; the Python loop is the bit-identical fallback.
    """
    if len(values) > 512:
        from deep_recommenders_tpu import native

        if native.available():
            return native.crc32_bucket(values, num_buckets)
    out = np.empty(len(values), dtype=np.int32)
    for i, v in enumerate(values):
        if isinstance(v, bytes):
            b = v
        else:
            b = str(v).encode("utf-8")
        out[i] = zlib.crc32(b) % num_buckets
    return out


def vocab_lookup(values: Sequence, vocab: Sequence) -> np.ndarray:
    """Map values to vocab indices; OOV -> len(vocab)."""
    table = {v: i for i, v in enumerate(vocab)}
    oov = len(vocab)
    return np.asarray([table.get(v, oov) for v in values], dtype=np.int32)


@dataclasses.dataclass(frozen=True)
class Feature:
    """A categorical feature spec (vocab-list or hash-bucket transform).

    max_len > 1 declares a multi-valued bag (e.g. movie genres), encoded as a
    fixed-width padded ID tensor + weight tensor. ``combiner`` ("mean"/"sum")
    matches tf.feature_column embedding combiners.
    """

    name: str
    vocab: Optional[Tuple] = None
    hash_buckets: Optional[int] = None
    max_len: int = 1
    combiner: str = "mean"

    def __post_init__(self):
        if (self.vocab is None) == (self.hash_buckets is None):
            raise ValueError(
                f"Feature {self.name!r}: exactly one of vocab / hash_buckets "
                "must be set"
            )
        if self.combiner not in ("mean", "sum"):
            raise ValueError(f"Unknown combiner {self.combiner!r}")

    @property
    def cardinality(self) -> int:
        """Number of ID buckets (vocab features reserve an OOV bucket)."""
        if self.vocab is not None:
            return len(self.vocab) + 1
        return int(self.hash_buckets)

    @property
    def is_multi(self) -> bool:
        return self.max_len > 1

    def _encode_values(self, values: Sequence) -> np.ndarray:
        if self.vocab is not None:
            return vocab_lookup(values, self.vocab)
        return crc32_hash_bucket(values, self.hash_buckets)

    def encode(self, values: Sequence) -> Dict[str, np.ndarray]:
        """Encode one column of raw values into the ID-tensor dict entries.

        Dedup-then-gather: a 1M-row corpus has only thousands of distinct
        users/movies/bags, so the hash/vocab transform runs once per UNIQUE
        value and a vectorized take fans it back out — ~100x faster than
        per-row Python loops on MovieLens-scale columns.
        """
        if not self.is_multi:
            arr = np.asarray(values, dtype=object)
            uniques, inverse = np.unique(arr, return_inverse=True)
            encoded = self._encode_values(list(uniques))
            return {self.name: encoded[inverse].astype(np.int32)}
        # Multi-valued bag: dedup by bag tuple.
        index_of: Dict[tuple, int] = {}
        inverse = np.empty(len(values), dtype=np.int64)
        unique_bags = []
        for i, bag in enumerate(values):
            key = tuple(bag)
            slot = index_of.get(key)
            if slot is None:
                slot = len(unique_bags)
                index_of[key] = slot
                unique_bags.append(key)
            inverse[i] = slot
        u = len(unique_bags)
        ids_u = np.zeros((u, self.max_len), dtype=np.int32)
        wt_u = np.zeros((u, self.max_len), dtype=np.float32)
        for i, bag in enumerate(unique_bags):
            bag = list(bag)[: self.max_len]
            if not bag:
                continue
            row = self._encode_values(bag)
            ids_u[i, : len(row)] = row
            wt_u[i, : len(row)] = 1.0
        return {
            self.name: ids_u[inverse],
            self.name + WEIGHT_SUFFIX: wt_u[inverse],
        }


@dataclasses.dataclass(frozen=True)
class CrossedFeature:
    """A hashed cross of two or more raw columns (tf crossed_column analog;
    used by the reference WDL example's gender x age etc. crosses, ref
    examples/train_wdl_on_movielens_estimator.py:37-47). Single-valued only."""

    name: str
    keys: Tuple[str, ...]
    hash_buckets: int = 1000
    max_len: int = 1  # crosses are single-valued
    combiner: str = "sum"

    @property
    def cardinality(self) -> int:
        return int(self.hash_buckets)

    @property
    def is_multi(self) -> bool:
        return False

    def encode_cross(self, raw: Mapping[str, Sequence]) -> Dict[str, np.ndarray]:
        cols = [raw[k] for k in self.keys]
        joined = [
            "_X_".join(str(v) for v in vals) for vals in zip(*cols)
        ]
        return {self.name: crc32_hash_bucket(joined, self.hash_buckets)}


@dataclasses.dataclass(frozen=True)
class DenseFeature:
    """A dense float feature (e.g. the synthetic multitask C0..Cd columns)."""

    name: str
    dim: int = 1

    def encode(self, values: Sequence) -> Dict[str, np.ndarray]:
        arr = np.asarray(values, dtype=np.float32)
        if self.dim > 1 and arr.ndim == 1:
            raise ValueError(f"DenseFeature {self.name}: expected 2-D values")
        return {self.name: arr}


class FeatureEncoder:
    """Encodes a raw-column dict into the framework's ID-tensor batch dict."""

    def __init__(
        self,
        features: Sequence[Union[Feature, CrossedFeature, DenseFeature]],
    ):
        self.features = list(features)
        names = [f.name for f in self.features]
        if len(set(names)) != len(names):
            raise ValueError("Duplicate feature names")

    @property
    def categorical(self) -> Tuple[Feature, ...]:
        return tuple(f for f in self.features if isinstance(f, Feature))

    def encode(self, raw: Mapping[str, Sequence]) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}
        for f in self.features:
            if isinstance(f, CrossedFeature):
                out.update(f.encode_cross(raw))
                continue
            if f.name not in raw:
                raise KeyError(f"Missing raw column {f.name!r}")
            out.update(f.encode(raw[f.name]))
        return out
