"""MovieLens-1M ingest: ETL + ranking task view, as pre-batched ID tensors.

Reference semantics reproduced (deep_recommenders/datasets/movielens.py):
- corpus stats + vocabs: 1,000,209 ratings / 6,040 users / 3,952 movies,
  gender/age/occupation/genres vocab lists (ref movielens.py:103-112)
- ETL: join users.dat + movies.dat onto shuffled ratings.dat by ID
  (ref movielens.py:65-93)
- ranking view: columns renamed to user_id/user_gender/user_age/
  user_occupation/movie_id/movie_genres and label = float(rating > 3)
  (ref movielens.py:170-186)
- 0.8/0.2 train/test split (ref movielens.py:148-168). The reference's
  ``test_steps`` arithmetic mixes per-epoch and total-epoch step counts so
  test data leaks from repeated epochs (SURVEY §fidelity); here the split is
  done ONCE over the shuffled example array before any epoch repetition.

TPU-first divergences (deliberate, documented):
- All feature transforms run once on the host; batches are dense int32 ID
  tensors with static shapes (see features/columns.py).
- ``movie_genres`` uses the real genres vocab. The reference examples build
  it from gender_vocab by mistake (e.g. ref
  examples/train_deepfm_on_movielens_estimator.py:23-24).
- Since this environment has no network access, a deterministic synthetic
  generator with the same schema/marginals and a learnable latent-factor
  rating structure stands in when the ml-1m .dat files are absent.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from deep_recommenders_tpu.features.columns import (
    Feature,
    FeatureEncoder,
    WEIGHT_SUFFIX,
)

# Corpus constants (ref movielens.py:103-112).
NUM_RATINGS = 1_000_209
NUM_USERS = 6_040
NUM_MOVIES = 3_952
GENDER_VOCAB = ("F", "M")
AGE_VOCAB = (1, 18, 25, 35, 45, 50, 56)
OCCUPATION_VOCAB = tuple(range(21))
GENRES_VOCAB = (
    "Action", "Adventure", "Animation", "Children's", "Comedy",
    "Crime", "Documentary", "Drama", "Fantasy", "Film-Noir", "Horror",
    "Musical", "Mystery", "Romance", "Sci-Fi", "Thriller", "War", "Western",
)
MAX_GENRES = 6  # ml-1m movies carry at most 6 genres

ML1M_URL = "https://files.grouplens.org/datasets/movielens/ml-1m.zip"


def download_ml1m(
    dest_dir: str, url: str = ML1M_URL, timeout: float = 60.0
) -> str:
    """Download + unzip the real ml-1m corpus (ref movielens.py:8-16).

    Returns the directory containing the extracted ``.dat`` files
    (``<dest_dir>/ml-1m``), skipping both download and extraction when they
    are already present. Raises ``OSError`` when the network is
    unreachable — callers in offline environments should fall back to
    ``synthesize_ml1m`` (as every example in this repo does).
    """
    import urllib.request
    import zipfile

    out = os.path.join(dest_dir, "ml-1m")
    if os.path.exists(os.path.join(out, "ratings.dat")):
        return out
    os.makedirs(dest_dir, exist_ok=True)
    zip_path = os.path.join(dest_dir, "ml-1m.zip")
    if not os.path.exists(zip_path):
        tmp = zip_path + ".part"
        with urllib.request.urlopen(url, timeout=timeout) as r, open(
            tmp, "wb"
        ) as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        os.replace(tmp, zip_path)
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(dest_dir)
    return out


def _load_dat(path: str, columns) -> Dict[str, Dict[str, str]]:
    """Parse an ml-1m ``::``-separated .dat file into {key: row_dict}."""
    data: Dict[str, Dict[str, str]] = {}
    with open(path, "r", encoding="unicode_escape") as f:
        for line in f:
            parts = line.strip("\n").split("::")
            data[parts[0]] = dict(zip(columns[1:], parts[1:]))
    return data


def load_ml1m(datadir: str, seed: int = 42) -> Dict[str, np.ndarray]:
    """Faithful ml-1m ETL: join users/movies onto shuffled ratings.

    Mirrors ref movielens.py:65-93 (join + shuffle) but emits numpy columns
    instead of TFRecords.
    """
    users = _load_dat(
        os.path.join(datadir, "users.dat"),
        ["UserID", "Gender", "Age", "Occupation", "Zip-code"],
    )
    movies = _load_dat(
        os.path.join(datadir, "movies.dat"), ["MovieID", "Title", "Genres"]
    )
    ratings_path = os.path.join(datadir, "ratings.dat")
    from deep_recommenders_tpu import native

    parsed = (
        native.parse_ml1m_ratings(ratings_path)
        if native.available()
        else None
    )
    if parsed is not None:
        # Native parse + vectorized attribute gather by integer id.
        uid_i, mid_i, rating_arr, ts_arr = parsed
        max_u = int(uid_i.max()) + 1
        max_m = int(mid_i.max()) + 1
        u_gender = np.empty(max_u, dtype=object)
        u_age = np.zeros(max_u, np.int64)
        u_occ = np.zeros(max_u, np.int64)
        u_zip = np.empty(max_u, dtype=object)
        for k, row in users.items():
            i = int(k)
            u_gender[i] = row["Gender"]
            u_age[i] = int(row["Age"])
            u_occ[i] = int(row["Occupation"])
            u_zip[i] = row["Zip-code"]
        m_genres = np.empty(max_m, dtype=object)
        m_title = np.empty(max_m, dtype=object)
        for k, row in movies.items():
            m_genres[int(k)] = tuple(row["Genres"].split("|"))
            m_title[int(k)] = row["Title"]
        uid = np.char.mod("%d", uid_i).astype(object)
        mid = np.char.mod("%d", mid_i).astype(object)
        rating = rating_arr
        ts = ts_arr
        gender = u_gender[uid_i]
        age = u_age[uid_i]
        occ = u_occ[uid_i]
        zipcode = u_zip[uid_i]
        title = m_title[mid_i]
        genres = m_genres[mid_i]
        n = len(uid)
    else:
        uid, mid, rating, ts = [], [], [], []
        gender, age, occ, genres = [], [], [], []
        zipcode, title = [], []
        with open(ratings_path, "r", encoding="unicode_escape") as f:
            for line in f:
                u, m, r, t = line.strip().split("::")
                uid.append(u)
                mid.append(m)
                rating.append(int(r))
                ts.append(int(t))
                urow, mrow = users[u], movies[m]
                gender.append(urow["Gender"])
                age.append(int(urow["Age"]))
                occ.append(int(urow["Occupation"]))
                zipcode.append(urow["Zip-code"])
                title.append(mrow["Title"])
                genres.append(tuple(mrow["Genres"].split("|")))
        n = len(uid)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)

    def _take(seq):
        arr = np.asarray(seq, dtype=object)
        return arr[perm]

    return {
        "UserID": _take(uid),
        "MovieID": _take(mid),
        "Rating": np.asarray(rating, dtype=np.int64)[perm],
        "Timestamp": np.asarray(ts, dtype=np.int64)[perm],
        "Gender": _take(gender),
        "Age": np.asarray(age, dtype=np.int64)[perm],
        "Occupation": np.asarray(occ, dtype=np.int64)[perm],
        "Zip-code": _take(zipcode),
        "Title": _take(title),
        "Genres": _take(genres),
    }


def synthesize_ml1m(
    num_ratings: int = NUM_RATINGS,
    num_users: int = NUM_USERS,
    num_movies: int = NUM_MOVIES,
    latent_dim: int = 8,
    seed: int = 42,
    movie_popularity: str = "zipf-draw",
) -> Dict[str, np.ndarray]:
    """Deterministic MovieLens-like corpus with learnable structure.

    Ratings follow a latent-factor model: propensity = sigmoid of
    (user_factor . movie_factor + user_bias + movie_bias), quantile-mapped to
    the 1..5 scale so ``rating > 3`` is predictable from IDs (and weakly from
    demographics, which bias the user factors). Same schema/vocabs as ml-1m.

    ``movie_popularity``:
    - "zipf-draw" (default): per-movie popularity drawn from np Zipf(1.4).
      KEPT AS-IS for bit-identity with every CTR baseline measured since
      round 1 — but note its unbounded tail concentrates ~50% of ratings on
      a handful of movies (1M draws hit only ~445 distinct movies), which
      makes it unusable as a RETRIEVAL corpus.
    - "rank-power": popularity ∝ (rank+1)^-0.7 — finite skew matching real
      ml-1m's shape (top movie ~0.3-2% of ratings; 1M draws cover ~all
      3,952 movies, test split ~3.7k distinct). Used by the two-tower
      quality harness and benchmarks/reference_two_tower.py, on BOTH sides
      of the parity row.
    """
    rng = np.random.default_rng(seed)
    # Per-user attributes.
    user_gender = rng.choice(len(GENDER_VOCAB), num_users)
    user_age = rng.choice(len(AGE_VOCAB), num_users)
    user_occ = rng.choice(len(OCCUPATION_VOCAB), num_users)
    u_fac = rng.normal(0, 1.0, (num_users, latent_dim))
    # Demographics nudge the factors so demographic features carry signal.
    u_fac[:, 0] += 0.5 * (user_gender * 2 - 1)
    u_fac[:, 1] += 0.25 * (user_age - len(AGE_VOCAB) / 2)
    u_bias = rng.normal(0, 0.5, num_users)
    # Per-movie attributes.
    m_fac = rng.normal(0, 1.0, (num_movies, latent_dim))
    m_bias = rng.normal(0, 0.5, num_movies)
    n_genres = rng.integers(1, 4, num_movies)
    movie_genres = [
        tuple(
            GENRES_VOCAB[g]
            for g in rng.choice(len(GENRES_VOCAB), k, replace=False)
        )
        for k in n_genres
    ]
    # Zip-code/Title come from an INDEPENDENT stream so adding them (round 2,
    # full 10-column parity) leaves the round-1 corpus — and every measured
    # baseline on it — bit-identical.
    rng_aux = np.random.default_rng(seed + 7919)
    user_zip = np.char.mod("%05d", rng_aux.integers(0, 100000, num_users))
    movie_year = rng_aux.integers(1919, 2001, num_movies)
    movie_title = np.asarray(
        [f"Movie {m} ({movie_year[m]})" for m in range(num_movies)],
        dtype=object,
    )
    # Popularity-skewed sampling of (user, movie) pairs, like real ML-1M.
    if movie_popularity == "zipf-draw":
        movie_pop = rng.zipf(1.4, num_movies).astype(np.float64)
    elif movie_popularity == "rank-power":
        # Finite-skew rank power law. Deterministic for a fixed seed
        # WITHIN this branch; it does NOT reproduce the zipf branch's
        # downstream uid/mid/noise draws (permutation and zipf rejection
        # sampling consume different amounts of the bit stream), so the
        # two popularity modes define two distinct corpora (ADVICE r4).
        shuffle = rng.permutation(num_movies)
        ranks = np.empty(num_movies, np.float64)
        ranks[shuffle] = np.arange(1, num_movies + 1)
        movie_pop = ranks**-0.7
    else:
        raise ValueError(f"unknown movie_popularity {movie_popularity!r}")
    movie_p = movie_pop / movie_pop.sum()
    uid = rng.integers(0, num_users, num_ratings)
    mid = rng.choice(num_movies, num_ratings, p=movie_p)
    score = (
        (u_fac[uid] * m_fac[mid]).sum(-1) / np.sqrt(latent_dim)
        + u_bias[uid]
        + m_bias[mid]
        + rng.normal(0, 0.8, num_ratings)
    )
    # Quantile-map scores to ratings 1..5 with ml-1m-like marginals
    # (~57.5% of ml-1m ratings are > 3).
    qs = np.quantile(score, [0.06, 0.17, 0.425, 0.77])
    rating = np.digitize(score, qs) + 1
    return {
        "UserID": np.char.mod("%d", uid),
        "MovieID": np.char.mod("%d", mid),
        "Rating": rating.astype(np.int64),
        "Timestamp": rng.integers(9.5e8, 1.05e9, num_ratings),
        "Gender": np.asarray(GENDER_VOCAB, dtype=object)[user_gender[uid]],
        "Age": np.asarray(AGE_VOCAB, dtype=np.int64)[user_age[uid]],
        "Occupation": np.asarray(OCCUPATION_VOCAB, dtype=np.int64)[
            user_occ[uid]
        ],
        "Zip-code": user_zip[uid].astype(object),
        "Title": movie_title[mid],
        "Genres": np.asarray(movie_genres, dtype=object)[mid],
    }


# The reference corpus schema: 10 columns per example
# (ref deep_recommenders/datasets/movielens.py:116-125 — int64 Age/
# Occupation/Rating/Timestamp; string UserID/MovieID/Gender/Zip-code/Title;
# variable-length Genres).
CORPUS_COLUMNS = (
    "UserID", "MovieID", "Rating", "Timestamp", "Gender", "Age",
    "Occupation", "Zip-code", "Title", "Genres",
)
_STR_COLUMNS = ("UserID", "MovieID", "Gender", "Zip-code", "Title")


def serialize_corpus(raw: Dict[str, np.ndarray], path: str) -> str:
    """Write the joined corpus as an offline artifact (one .npz file).

    The TPU-framework analog of the reference's ``serialize_tfrecords``
    (ref movielens.py:65-93): ETL runs once, the artifact holds all 10
    reference columns, and datasets parse the artifact instead of re-joining
    .dat files. Variable-length Genres are stored '|'-joined (the raw
    movies.dat encoding) so the file stays pickle-free.
    """
    missing = [c for c in CORPUS_COLUMNS if c not in raw]
    if missing:
        raise ValueError(f"corpus missing columns {missing}")
    cols = {}
    for c in CORPUS_COLUMNS:
        if c == "Genres":
            cols[c] = np.asarray(
                ["|".join(g) for g in raw[c]], dtype=np.str_
            )
        elif c in _STR_COLUMNS:
            cols[c] = np.asarray(raw[c]).astype(np.str_)
        else:
            cols[c] = np.asarray(raw[c], dtype=np.int64)
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **cols)
    return path


def read_corpus(path: str) -> Dict[str, np.ndarray]:
    """Load a ``serialize_corpus`` artifact back into raw columns
    (Genres re-split into tuples)."""
    with np.load(path, allow_pickle=False) as f:
        out = {k: f[k] for k in f.files}
    out["Genres"] = np.asarray(
        [tuple(s.split("|")) if s else () for s in out["Genres"]],
        dtype=object,
    )
    for c in _STR_COLUMNS:
        out[c] = out[c].astype(object)
    return out


def default_movielens_features(
    user_hash_buckets: int = NUM_USERS,
    movie_hash_buckets: int = NUM_MOVIES,
) -> Tuple[Feature, ...]:
    """The canonical MovieLens feature set, mirroring the reference examples'
    build_columns() (hash-bucket ids, vocab-list demographics; ref
    examples/train_deepfm_on_movielens_estimator.py:11-35) but with the real
    genres vocab."""
    return (
        Feature("user_id", hash_buckets=user_hash_buckets),
        Feature("user_gender", vocab=GENDER_VOCAB),
        Feature("user_age", vocab=AGE_VOCAB),
        Feature("user_occupation", vocab=OCCUPATION_VOCAB),
        Feature("movie_id", hash_buckets=movie_hash_buckets),
        Feature(
            "movie_genres",
            vocab=GENRES_VOCAB,
            max_len=MAX_GENRES,
            combiner="mean",
        ),
    )


@dataclasses.dataclass
class MovielensRanking:
    """CTR ranking view of MovieLens: encoded ID tensors + binary label.

    label = float(rating > 3) (ref movielens.py:181-183); train/test split
    0.8/0.2 once over shuffled examples (fixing the reference's leaky
    ``test_steps`` arithmetic at ref movielens.py:159-160).
    """

    batch_size: int = 1024
    train_size: float = 0.8
    datadir: Optional[str] = None
    corpus_path: Optional[str] = None  # serialize_corpus artifact
    num_ratings: int = NUM_RATINGS
    seed: int = 42
    # Synthetic-corpus movie marginal (see synthesize_ml1m): "zipf-draw"
    # keeps the round-1 CTR-baseline bit-stream; "rank-power" is the
    # finite-skew marginal retrieval work needs (full movie coverage).
    movie_popularity: str = "zipf-draw"
    features: Tuple[Feature, ...] = dataclasses.field(
        default_factory=default_movielens_features
    )

    cache_dir: Optional[str] = dataclasses.field(
        default_factory=lambda: os.environ.get(
            "DRT_CACHE_DIR",
            os.path.join(os.path.dirname(__file__), "..", "..", ".cache"),
        )
    )

    def __post_init__(self):
        cache_path = None
        if self.cache_dir:
            import hashlib

            spec_key = hashlib.md5(
                repr(
                    (self.features, self.num_ratings, self.seed,
                     self.datadir, self.corpus_path,
                     self.movie_popularity)
                ).encode()
            ).hexdigest()[:12]
            cache_path = os.path.join(
                # v2: adds the raw (pre-hash) MovieID column to the cache
                self.cache_dir, f"movielens_v2_{spec_key}.npz"
            )
        if cache_path and os.path.exists(cache_path):
            with np.load(cache_path, allow_pickle=True) as f:
                self._data = {
                    k: f[k]
                    for k in f.files
                    if k not in ("__label__", "__raw_movie_id__")
                }
                self._label = f["__label__"]
                self._raw_movie_id = f["__raw_movie_id__"]
        else:
            if self.corpus_path and os.path.exists(self.corpus_path):
                raw = read_corpus(self.corpus_path)
            elif self.datadir and os.path.exists(
                os.path.join(self.datadir, "ratings.dat")
            ):
                raw = load_ml1m(self.datadir, seed=self.seed)
            else:
                raw = synthesize_ml1m(
                    self.num_ratings, seed=self.seed,
                    movie_popularity=self.movie_popularity,
                )
            encoder = FeatureEncoder(self.features)
            self._data = encoder.encode(
                {
                    "user_id": raw["UserID"],
                    "user_gender": raw["Gender"],
                    "user_age": raw["Age"],
                    "user_occupation": raw["Occupation"],
                    "movie_id": raw["MovieID"],
                    "movie_genres": raw["Genres"],
                }
            )
            self._label = (raw["Rating"] > 3).astype(np.float32)[:, None]
            self._raw_movie_id = np.asarray(raw["MovieID"])
            if cache_path:
                os.makedirs(self.cache_dir, exist_ok=True)
                np.savez(
                    cache_path, __label__=self._label,
                    __raw_movie_id__=self._raw_movie_id, **self._data
                )
        n = len(self._label)
        self._n_train = int(n * self.train_size)
        self._n = n

    @property
    def feature_specs(self) -> Tuple[Feature, ...]:
        return tuple(self.features)

    @property
    def train_steps_per_epoch(self) -> int:
        return self._n_train // self.batch_size

    @property
    def test_steps(self) -> int:
        return (self._n - self._n_train) // self.batch_size

    def _slice(self, lo: int, hi: int):
        feats = {k: v[lo:hi] for k, v in self._data.items()}
        return feats, self._label[lo:hi]

    def train_arrays(
        self, whole_batches: bool = True
    ) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
        """The train split as (features dict, labels) numpy arrays.

        With ``whole_batches`` the split is truncated to a multiple of
        batch_size (static shapes for jit). Public accessor for loaders
        that want the raw split (DeviceData, NativeStreamLoader) instead
        of the batch iterators.
        """
        hi = (
            self.train_steps_per_epoch * self.batch_size
            if whole_batches
            else self._n_train
        )
        return self._slice(0, hi)

    def test_arrays(
        self, whole_batches: bool = False
    ) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
        """The test split as (features dict, labels) numpy arrays."""
        hi = (
            self._n_train + self.test_steps * self.batch_size
            if whole_batches
            else self._n
        )
        return self._slice(self._n_train, hi)

    def train_batches(
        self, epochs: int = 1, shuffle_seed: Optional[int] = None
    ) -> Iterator[Tuple[Dict[str, np.ndarray], np.ndarray]]:
        """Yield fixed-size train batches (remainder dropped: static shapes)."""
        b = self.batch_size
        for e in range(epochs):
            idx = np.arange(self._n_train)
            if shuffle_seed is not None:
                np.random.default_rng(shuffle_seed + e).shuffle(idx)
            for s in range(self.train_steps_per_epoch):
                rows = idx[s * b : (s + 1) * b]
                feats = {k: v[rows] for k, v in self._data.items()}
                yield feats, self._label[rows]

    def test_batches(
        self,
    ) -> Iterator[Tuple[Dict[str, np.ndarray], np.ndarray]]:
        b = self.batch_size
        for s in range(self.test_steps):
            lo = self._n_train + s * b
            yield self._slice(lo, lo + b)

    # -- retrieval (two-tower) view --------------------------------------
    USER_KEYS = ("user_id", "user_gender", "user_age", "user_occupation")
    ITEM_KEYS = ("movie_id", "movie_genres")

    def _pair_view(self, rows: np.ndarray):
        user = {
            k: v[rows]
            for k, v in self._data.items()
            if k.split(WEIGHT_SUFFIX)[0] in self.USER_KEYS
        }
        item = {
            k: v[rows]
            for k, v in self._data.items()
            if k.split(WEIGHT_SUFFIX)[0] in self.ITEM_KEYS
        }
        return user, item

    def retrieval_batches(
        self,
        epochs: int = 1,
        shuffle_seed: Optional[int] = None,
        split: str = "train",
    ) -> Iterator[Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]]:
        """(user_features, watched_movie_features) positive pairs for the
        two-tower task (in-batch negatives supply the contrast; the
        reference's retrieval stack consumes such pairs via sbcnm.Retrieval).
        Only positively-rated events (label 1) form pairs."""
        if split == "train":
            pos = np.flatnonzero(self._label[: self._n_train, 0] > 0.5)
        else:
            pos = self._n_train + np.flatnonzero(
                self._label[self._n_train :, 0] > 0.5
            )
        b = self.batch_size
        for e in range(epochs):
            idx = pos.copy()
            if shuffle_seed is not None:
                np.random.default_rng(shuffle_seed + e).shuffle(idx)
            for s in range(len(idx) // b):
                yield self._pair_view(idx[s * b : (s + 1) * b])

    def retrieval_arrays(self, split: str = "train"):
        """Every positive (user, item) pair of the split as numpy dicts,
        plus the paired movie ids (two-tower ``labels``: candidate ids for
        accidental-negative removal). The whole-split form of
        :meth:`retrieval_batches`, for DeviceData/fit_device."""
        if split == "train":
            pos = np.flatnonzero(self._label[: self._n_train, 0] > 0.5)
        else:
            pos = self._n_train + np.flatnonzero(
                self._label[self._n_train :, 0] > 0.5
            )
        user, item = self._pair_view(pos)
        return user, item, self._data["movie_id"][pos]

    def raw_movie_ids(self, split: str = "train") -> np.ndarray:
        """Raw (pre-hash) MovieID per positive pair row of the split — the
        corpus identity for full-corpus retrieval evaluation. The encoded
        ids from :meth:`retrieval_arrays` are CRC32 buckets and LOSSY
        (3,952 raw ids -> ~2,468 buckets at the default spec); deduping an
        eval corpus by bucket shrinks it ~1.6x vs the reference protocol
        (VERDICT r4 #6)."""
        if split == "train":
            pos = np.flatnonzero(self._label[: self._n_train, 0] > 0.5)
        else:
            pos = self._n_train + np.flatnonzero(
                self._label[self._n_train :, 0] > 0.5
            )
        return self._raw_movie_id[pos]

    def user_specs(self) -> Tuple[Feature, ...]:
        return tuple(f for f in self.features if f.name in self.USER_KEYS)

    def item_specs(self) -> Tuple[Feature, ...]:
        return tuple(f for f in self.features if f.name in self.ITEM_KEYS)
