"""IMDB-style binary text classification data.

The reference uses tf.keras.datasets.imdb (downloaded; ref
examples/train_transformer_on_imdb_keras.py:36-44). This environment has no
network, so ``SyntheticImdb`` generates a deterministic stand-in with the
same contract: integer token sequences (0 = padding, small ids = frequent
tokens) and a binary label, where sentiment is carried by planted
"polarity" tokens with Zipfian background vocabulary. ``load_imdb_npz``
reads the real keras-format imdb.npz when a path is provided.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Tuple

import numpy as np


def _pad(seqs, max_len: int) -> np.ndarray:
    out = np.zeros((len(seqs), max_len), np.int32)
    for i, s in enumerate(seqs):
        s = list(s)[:max_len]
        out[i, : len(s)] = s  # post-padding with 0
    return out


def load_imdb_npz(
    path: str, num_words: int = 10000, max_len: int = 200
) -> Tuple[Tuple[np.ndarray, np.ndarray], Tuple[np.ndarray, np.ndarray]]:
    """Parse a keras imdb.npz (x_train/y_train/x_test/y_test object arrays)."""
    with np.load(path, allow_pickle=True) as f:
        x_train, y_train = f["x_train"], f["y_train"]
        x_test, y_test = f["x_test"], f["y_test"]

    def clip(seqs):
        return [[t if t < num_words else 2 for t in s] for s in seqs]

    return (
        (_pad(clip(x_train), max_len), y_train.astype(np.int32)),
        (_pad(clip(x_test), max_len), y_test.astype(np.int32)),
    )


@dataclasses.dataclass
class SyntheticImdb:
    num_examples: int = 5000
    num_words: int = 2000
    max_len: int = 128
    num_polarity_tokens: int = 40
    seed: int = 42

    def __post_init__(self):
        rng = np.random.default_rng(self.seed)
        n, v, L = self.num_examples, self.num_words, self.max_len
        # Zipfian background tokens in [10, v); ids < 10 reserved.
        background = 10 + (
            rng.zipf(1.3, size=(n, L)) % (v - 10)
        ).astype(np.int32)
        lengths = rng.integers(L // 4, L + 1, n)
        labels = rng.integers(0, 2, n).astype(np.int32)
        # Polarity tokens: two disjoint pools; documents mostly draw from
        # their class's pool, with noise.
        pos_pool = rng.choice(
            np.arange(10, v), 2 * self.num_polarity_tokens, replace=False
        )
        pools = pos_pool[: self.num_polarity_tokens], pos_pool[
            self.num_polarity_tokens :
        ]
        tokens = background
        for i in range(n):
            num_polar = rng.integers(3, 10)
            pool = pools[labels[i]]
            positions = rng.integers(0, lengths[i], num_polar)
            tokens[i, positions] = rng.choice(pool, num_polar)
            tokens[i, lengths[i] :] = 0  # padding
        split = int(n * 0.8)
        self.train = (tokens[:split], labels[:split])
        self.test = (tokens[split:], labels[split:])

    def batches(
        self, split: str = "train", batch_size: int = 64,
        epochs: int = 1, shuffle_seed: int = 0,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        x, y = self.train if split == "train" else self.test
        for e in range(epochs):
            idx = np.arange(len(y))
            if split == "train":
                np.random.default_rng(shuffle_seed + e).shuffle(idx)
            for s in range(len(y) // batch_size):
                rows = idx[s * batch_size : (s + 1) * batch_size]
                yield x[rows], y[rows]
