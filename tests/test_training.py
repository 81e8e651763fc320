import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deep_recommenders_tpu.datasets import MovielensRanking
from deep_recommenders_tpu.features import Feature
from deep_recommenders_tpu.models.ranking import DeepFM, FactorizationMachine, FNN
from deep_recommenders_tpu.training import (
    Trainer,
    restore_checkpoint,
    save_checkpoint,
    warm_start_from,
)
from deep_recommenders_tpu.training.metrics import AUC, Mean, PrecisionRecall
from deep_recommenders_tpu.training.optimizers import ftrl, scoped_optimizer


@pytest.fixture(scope="module")
def small_ds():
    return MovielensRanking(batch_size=128, num_ratings=6000, seed=11)


def test_train_smoke_deepfm_learns(small_ds):
    """Train-smoke idiom (SURVEY §4.4) + learnability: AUC > 0.5."""
    specs = small_ds.feature_specs
    model = DeepFM(specs, embedding_dim=8, hidden=(32, 16))
    trainer = Trainer(model, optax.adam(1e-2))
    result = trainer.fit(
        lambda: small_ds.train_batches(epochs=3, shuffle_seed=0),
        lambda: small_ds.test_batches(),
        epochs=1,
        verbose=False,
    )
    summary = result["history"][-1]
    assert summary["auc"] > 0.55, summary
    assert result["examples_per_sec"] > 0


def test_auc_metric_matches_sklearn_style(rng):
    labels = (rng.random(500) > 0.5).astype(np.float32)
    scores = np.clip(
        labels * 0.3 + rng.random(500) * 0.7, 0, 1
    ).astype(np.float32)
    auc = AUC(num_thresholds=400)
    state = auc.init()
    # Streamed in chunks == one shot.
    for lo in range(0, 500, 100):
        state = auc.update(
            state, jnp.asarray(labels[lo : lo + 100]),
            jnp.asarray(scores[lo : lo + 100]),
        )
    got = float(auc.compute(state))
    # Exact rank-based AUC.
    order = np.argsort(scores)
    ranks = np.empty(500)
    ranks[order] = np.arange(1, 501)
    n_pos, n_neg = labels.sum(), (1 - labels).sum()
    exact = (ranks[labels == 1].sum() - n_pos * (n_pos + 1) / 2) / (
        n_pos * n_neg
    )
    assert abs(got - exact) < 0.01, (got, exact)


def test_precision_recall_and_mean():
    pr = PrecisionRecall()
    state = pr.init()
    labels = jnp.asarray([1, 1, 0, 0], jnp.float32)
    preds = jnp.asarray([0.9, 0.2, 0.8, 0.1], jnp.float32)
    state = pr.update(state, labels, preds)
    out = pr.compute(state)
    np.testing.assert_allclose(float(out["precision"]), 0.5, rtol=1e-5)
    np.testing.assert_allclose(float(out["recall"]), 0.5, rtol=1e-5)
    m = Mean.init()
    m = Mean.update(m, jnp.asarray([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(float(Mean.compute(m)), 2.0)


def test_ftrl_sparsifies():
    """FTRL with L1 drives small-signal weights to exactly zero."""
    opt = ftrl(learning_rate=0.5, l1_regularization_strength=0.1)
    params = {"w": jnp.asarray([1.0, 1.0])}
    state = opt.init(params)
    # Strong gradient on coord 0, tiny on coord 1.
    for _ in range(50):
        grads = {"w": jnp.asarray([1.0, 1e-4])}
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    w = np.asarray(params["w"])
    assert w[1] == 0.0  # L1 zeroed the noise coordinate
    assert w[0] < -0.5  # strong signal moved against gradient


def test_scoped_optimizer_routes_by_path():
    params = {
        "params": {
            "wide": {"w": jnp.ones(3)},
            "deep": {"k": jnp.ones(3)},
        }
    }
    opt = scoped_optimizer(
        {"wide": optax.sgd(1.0)}, optax.sgd(0.1), params
    )
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    np.testing.assert_allclose(updates["params"]["wide"]["w"], -1.0)
    np.testing.assert_allclose(updates["params"]["deep"]["k"], -0.1)


def test_warm_start_fnn_from_fm(small_ds, tmp_path):
    """The FNN two-phase flow (ref fnn.py:32-48) as checkpoint + graft."""
    specs = small_ds.feature_specs
    batch, _ = next(iter(small_ds.train_batches()))
    fm = FactorizationMachine(specs, embedding_dim=8)
    fm_params = fm.init(jax.random.PRNGKey(0), batch)
    # Phase 1: "train" FM, checkpoint it.
    path = save_checkpoint(str(tmp_path / "fm"), fm_params)
    restored = restore_checkpoint(path, fm_params)
    # Phase 2: graft into FNN.
    fnn = FNN(specs, embedding_dim=8, hidden=(16,))
    fnn_params = fnn.init(jax.random.PRNGKey(1), batch)
    warmed = warm_start_from(fnn_params, restored)
    np.testing.assert_allclose(
        np.asarray(warmed["params"]["embeddings"]["table"]),
        np.asarray(fm_params["params"]["embeddings"]["table"]),
    )
    np.testing.assert_allclose(
        np.asarray(warmed["params"]["linear"]["weights"]),
        np.asarray(fm_params["params"]["linear"]["weights"]),
    )
    # Warmed params still run.
    out = fnn.apply(warmed, batch)
    assert out.shape == (small_ds.batch_size, 1)


def test_warm_start_shape_mismatch_raises(small_ds):
    specs = small_ds.feature_specs
    batch, _ = next(iter(small_ds.train_batches()))
    fm = FactorizationMachine(specs, embedding_dim=8)
    fm_params = fm.init(jax.random.PRNGKey(0), batch)
    fnn = FNN(specs, embedding_dim=4, hidden=(16,))  # different dim
    fnn_params = fnn.init(jax.random.PRNGKey(1), batch)
    with pytest.raises(ValueError):
        warm_start_from(fnn_params, fm_params)


def test_smoothed_sparse_ce_matches_dense_form(rng):
    import jax
    import jax.numpy as jnp

    from deep_recommenders_tpu.training.losses import (
        label_smoothing,
        smoothed_sparse_softmax_cross_entropy,
        softmax_cross_entropy,
    )

    logits = jnp.asarray(rng.normal(0, 2, (6, 9, 31)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, 31, (6, 9)))
    mask = jnp.asarray((rng.random((6, 9)) < 0.8).astype(np.float32))
    for eps in (0.0, 0.1):
        dense = softmax_cross_entropy(
            logits, label_smoothing(jax.nn.one_hot(targets, 31), eps),
            mask=mask,
        )
        sparse = smoothed_sparse_softmax_cross_entropy(
            logits, targets, epsilon=eps, mask=mask
        )
        np.testing.assert_allclose(
            float(sparse), float(dense), rtol=1e-5, atol=1e-6
        )
