"""Model artifact round-trip: save -> load -> identical predictions + config.

The reference's signature keras property (ref tests/keras/test_fm.py:44-65,
test_dcn.py:25-45): a model reloads from disk without the constructing
script, with identical predictions and identical get_config(). Parameterized
over the zoo.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_recommenders_tpu.features import CrossedFeature, Feature
from deep_recommenders_tpu.models.multitask import ESMM, MMoE
from deep_recommenders_tpu.models.nlp import Transformer
from deep_recommenders_tpu.models.ranking import (
    DCN,
    DIN,
    DeepFM,
    FNN,
    FactorizationMachine,
    WideDeep,
    XDeepFM,
)
from deep_recommenders_tpu.models.retrieval import GCN, TwoTower
from deep_recommenders_tpu.serving import load_model, model_config, save_model

SPECS = (
    Feature("user", hash_buckets=50),
    Feature("gender", vocab=("F", "M")),
    Feature("item", hash_buckets=60),
    Feature("tags", vocab=tuple(range(7)), max_len=3),
)


def _id_batch(rng, b=8):
    return {
        "user": rng.integers(0, 50, b).astype(np.int32),
        "gender": rng.integers(0, 3, b).astype(np.int32),
        "item": rng.integers(0, 60, b).astype(np.int32),
        "tags": rng.integers(0, 8, (b, 3)).astype(np.int32),
        "tags__wt": (rng.random((b, 3)) < 0.8).astype(np.float32),
    }


def _dense_x(rng, b=8, d=16):
    return (jnp.asarray(rng.normal(size=(b, d)).astype(np.float32)),)


CASES = {
    "deepfm": (
        lambda: DeepFM(SPECS, embedding_dim=8, hidden=(16,)),
        lambda rng: (_id_batch(rng),),
    ),
    "fm": (
        lambda: FactorizationMachine(SPECS, embedding_dim=8),
        lambda rng: (_id_batch(rng),),
    ),
    "fnn": (
        lambda: FNN(SPECS, embedding_dim=8, hidden=(16,)),
        lambda rng: (_id_batch(rng),),
    ),
    "widedeep": (
        lambda: WideDeep(
            deep_specs=SPECS,
            wide_specs=SPECS
            + (CrossedFeature("gxi", ("gender", "item"), hash_buckets=40),),
            embedding_dim=8,
            hidden=(16,),
        ),
        lambda rng: (
            {
                **_id_batch(rng),
                "gxi": rng.integers(0, 40, 8).astype(np.int32),
            },
        ),
    ),
    "dcn": (
        lambda: DCN(
            SPECS, embedding_dim=8, num_cross_layers=2,
            projection_dim=4, hidden=(16,),
        ),
        lambda rng: (_id_batch(rng),),
    ),
    "xdeepfm": (
        lambda: XDeepFM(
            SPECS, embedding_dim=8, cin_feature_maps=(8,), hidden=(16,),
        ),
        lambda rng: (_id_batch(rng),),
    ),
    # 2-layer relu config = the fused-stack param layout (cin_w1/cin_w2,
    # round 5) — distinct from the generic layered path above.
    "xdeepfm_stack": (
        lambda: XDeepFM(
            SPECS, embedding_dim=8, cin_feature_maps=(6, 6), hidden=(16,),
        ),
        lambda rng: (_id_batch(rng),),
    ),
    "mmoe": (
        lambda: MMoE(
            num_tasks=2, num_experts=3, expert_hidden=(16,),
            expert_dim=8, tower_hidden=(8,),
        ),
        lambda rng: _dense_x(rng),
    ),
    "esmm": (
        lambda: ESMM(cvr_hidden=(16,), ctr_hidden=(16,)),
        lambda rng: _dense_x(rng),
    ),
    "gcn": (
        lambda: GCN(hidden=(8,), num_classes=3, dropout=0.0),
        lambda rng: (
            jnp.asarray(rng.normal(size=(10, 12)).astype(np.float32)),
            jnp.asarray(np.eye(10, dtype=np.float32)),
        ),
    ),
    "transformer": (
        lambda: Transformer(
            vocab_size=30, model_dim=16, num_heads=2,
            num_encoder_layers=1, num_decoder_layers=1, ffn_dim=32,
            dropout=0.0,
        ),
        lambda rng: (
            jnp.asarray(rng.integers(1, 30, (2, 6))),
            jnp.asarray(rng.integers(1, 30, (2, 5))),
        ),
    ),
    "two_tower": (
        lambda: TwoTower(
            query_specs=SPECS[:2], candidate_specs=SPECS[2:],
            embedding_dim=8, hidden=(16,), output_dim=8,
        ),
        lambda rng: (
            {
                "user": rng.integers(0, 50, 8).astype(np.int32),
                "gender": rng.integers(0, 3, 8).astype(np.int32),
            },
            {
                "item": rng.integers(0, 60, 8).astype(np.int32),
                "tags": rng.integers(0, 8, (8, 3)).astype(np.int32),
                "tags__wt": np.ones((8, 3), np.float32),
            },
        ),
    ),
    "din": (
        lambda: DIN(attention_units=8, hidden=(16,), use_dice=True),
        lambda rng: (
            jnp.asarray(rng.normal(size=(4, 5, 8)).astype(np.float32)),
            jnp.asarray(np.ones((4, 5), np.float32)),
            jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32)),
        ),
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_save_load_round_trip(name, rng, tmp_path):
    build, make_args = CASES[name]
    model = build()
    args = make_args(rng)
    params = model.init(jax.random.PRNGKey(0), *args)
    before = model.apply(params, *args)

    path = save_model(str(tmp_path / name), model, params)
    model2, params2 = load_model(path)

    # Identical config (the get_config() identity) and identical class.
    assert type(model2) is type(model)
    assert model_config(model2) == model_config(model)
    # Reconstructed model is field-for-field equal (flax dataclass eq).
    for f in dataclasses.fields(model):
        if f.name in ("parent", "name", "mesh"):
            continue
        assert getattr(model2, f.name) == getattr(model, f.name), f.name

    after = model2.apply(params2, *args)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_load_model_reattaches_mesh(rng, tmp_path):
    from deep_recommenders_tpu.parallel import MeshConfig, create_mesh

    model = DeepFM(SPECS, embedding_dim=8, hidden=(16,))
    batch = _id_batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch)
    path = save_model(str(tmp_path / "m"), model, params)
    mesh = create_mesh(MeshConfig(data=2, model=4))
    model2, _ = load_model(path, mesh=mesh)
    assert model2.mesh is mesh
