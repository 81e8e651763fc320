"""Serving export round-trip: the SavedModel-analog property (SURVEY §4 #5).

Exports the flagship DeepFM as StableHLO + params, reloads WITHOUT the model
class, and checks identical predictions — including a different batch size
through the polymorphic batch dim.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_recommenders_tpu.features import Feature
from deep_recommenders_tpu.models.ranking import DeepFM
from deep_recommenders_tpu.serving import export_model, load_serving_module


@pytest.fixture
def model_and_batch(rng):
    specs = (
        Feature("user", hash_buckets=50),
        Feature("movie", hash_buckets=40),
        Feature("genres", vocab=tuple(range(8)), max_len=3),
    )
    model = DeepFM(specs, embedding_dim=8, hidden=(16,))

    def make_batch(b):
        return {
            "user": jnp.asarray(rng.integers(0, 50, b).astype(np.int32)),
            "movie": jnp.asarray(rng.integers(0, 40, b).astype(np.int32)),
            "genres": jnp.asarray(
                rng.integers(0, 8, (b, 3)).astype(np.int32)
            ),
            "genres__wt": jnp.asarray(
                (rng.random((b, 3)) < 0.7).astype(np.float32)
            ),
        }

    batch = make_batch(16)
    params = model.init(jax.random.PRNGKey(0), batch)
    return model, params, batch, make_batch


def test_export_load_round_trip(tmp_path, model_and_batch):
    model, params, batch, make_batch = model_and_batch
    want = model.apply(params, batch)

    path = export_model(
        str(tmp_path / "export"), model.apply, params, batch
    )
    served = load_serving_module(path, params_template=params)
    got = served(batch)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )

    # polymorphic batch: a different batch size serves without re-export
    big = make_batch(64)
    np.testing.assert_allclose(
        np.asarray(served(big)),
        np.asarray(model.apply(params, big)),
        rtol=1e-5,
        atol=1e-6,
    )


def test_serving_validates_inputs(tmp_path, model_and_batch):
    model, params, batch, _ = model_and_batch
    path = export_model(str(tmp_path / "e2"), model.apply, params, batch)
    served = load_serving_module(path, params_template=params)
    with pytest.raises(ValueError, match="missing serving inputs"):
        served({"user": batch["user"]})
