import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deep_recommenders_tpu.datasets import Cora
from deep_recommenders_tpu.models.retrieval import GCN, GCNLayer
from deep_recommenders_tpu.training.losses import softmax_cross_entropy


def test_gcn_layer_golden(rng):
    """Ref tests/keras/test_gcn.py:18-64: layer == adj @ x @ W (+ act)."""
    n, f, units = 10, 6, 4
    x = rng.normal(size=(n, f)).astype(np.float32)
    adj = (rng.random((n, n)) < 0.3).astype(np.float32)
    layer = GCNLayer(units, activation=None, use_bias=False)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(adj))
    out = layer.apply(params, jnp.asarray(x), jnp.asarray(adj))
    w = np.asarray(params["params"]["kernel"])
    np.testing.assert_allclose(np.asarray(out), adj @ x @ w, rtol=1e-4)


def test_gcn_layer_residual_contract():
    x = jnp.ones((5, 4))
    adj = jnp.eye(5)
    layer = GCNLayer(3, use_residual=True)
    with pytest.raises(ValueError):
        layer.init(jax.random.PRNGKey(0), x, adj)
    ok = GCNLayer(4, use_residual=True)
    params = ok.init(jax.random.PRNGKey(0), x, adj)
    assert ok.apply(params, x, adj).shape == (5, 4)


def test_gcn_learns_cora():
    """Full-batch node classification on synthetic Cora beats chance
    (ref examples/train_gcn_on_cora_keras.py flow)."""
    cora = Cora(synthetic_nodes=300, synthetic_features=84, seed=0)
    splits = cora.splits(num_per_class=10, num_valid=50)
    x = jnp.asarray(cora.features)
    adj = jnp.asarray(cora.spectral_adjacency)
    train_labels, train_mask = splits["train"]
    test_labels, test_mask = splits["test"]

    model = GCN(hidden=(16,), num_classes=cora.num_classes, dropout=None)
    params = model.init(jax.random.PRNGKey(0), x, adj)
    opt = optax.adam(0.01)
    opt_state = opt.init(params)

    mask = jnp.asarray(train_mask.astype(np.float32))
    labels = jnp.asarray(train_labels)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, x, adj)
            return softmax_cross_entropy(logits, labels, mask=mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(100):
        params, opt_state, loss = step(params, opt_state)

    logits = np.asarray(model.apply(params, x, adj))
    pred = logits.argmax(1)
    acc = (pred[test_mask] == cora.labels[test_mask]).mean()
    assert acc > 0.4, acc  # 7 classes -> chance ~0.14


def test_sparse_adjacency_matmul_matches_dense(rng):
    from deep_recommenders_tpu.ops.sparse import SparseAdjacency

    n, f = 50, 12
    dense = (rng.random((n, n)) < 0.1).astype(np.float32) * rng.random((n, n))
    x = jnp.asarray(rng.normal(0, 1, (n, f)).astype(np.float32))
    sp = SparseAdjacency.from_dense(dense)
    np.testing.assert_allclose(
        np.asarray(sp @ x), np.asarray(jnp.asarray(dense) @ x),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sp.todense()), dense, rtol=1e-6, atol=1e-7
    )


def test_sparse_adjacency_from_scipy(rng):
    import scipy.sparse as sps

    from deep_recommenders_tpu.ops.sparse import SparseAdjacency

    n = 40
    dense = (rng.random((n, n)) < 0.15).astype(np.float32)
    sp = SparseAdjacency.from_scipy(sps.csr_matrix(dense))
    np.testing.assert_allclose(np.asarray(sp.todense()), dense)


def test_gcn_layer_sparse_matches_dense(rng):
    from deep_recommenders_tpu.models.retrieval.gcn import GCNLayer
    from deep_recommenders_tpu.ops.sparse import SparseAdjacency

    n, f = 30, 8
    dense = (rng.random((n, n)) < 0.2).astype(np.float32)
    x = jnp.asarray(rng.normal(0, 1, (n, f)).astype(np.float32))
    adj = jnp.asarray(dense)
    sp = SparseAdjacency.from_dense(dense)

    # Both contraction orders: units < f (X@W first) and units > f (A@X first).
    for units in (4, 16):
        layer = GCNLayer(units)
        params = layer.init(jax.random.PRNGKey(0), x, adj)
        out_dense = layer.apply(params, x, adj)
        out_sparse = layer.apply(params, x, sp)
        np.testing.assert_allclose(
            np.asarray(out_sparse), np.asarray(out_dense),
            rtol=1e-5, atol=1e-5,
        )


def test_gcn_model_trains_with_sparse_adjacency(rng):
    from deep_recommenders_tpu.ops.sparse import SparseAdjacency

    n, f = 60, 10
    dense = (rng.random((n, n)) < 0.1).astype(np.float32)
    dense = np.maximum(dense, dense.T) + np.eye(n, dtype=np.float32)
    sp = SparseAdjacency.from_dense(dense)
    x = jnp.asarray(rng.normal(0, 1, (n, f)).astype(np.float32))
    labels = jax.nn.one_hot(jnp.asarray(rng.integers(0, 3, n)), 3)

    model = GCN(hidden=(8,), num_classes=3, dropout=None)
    params = model.init(jax.random.PRNGKey(0), x, sp)
    opt = optax.adam(0.01)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, x, sp)
            return softmax_cross_entropy(logits, labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(20):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
