"""Mixed-precision (bf16 compute / fp32 params+logits) contract tests.

VERDICT r3 Next #5: every ranking model takes compute_dtype; params and the
returned logits stay fp32 (optimizer state and the loss boundary never see
bf16), the internal towers run bf16, and training still reduces the loss.
The AUC guard at the headline config runs on the chip (benchmarks / BASELINE
round-4 artifacts); these tests pin the structural contract on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deep_recommenders_tpu.features import Feature
from deep_recommenders_tpu.models.ranking import (
    DCN,
    DeepFM,
    FactorizationMachine,
    FNN,
    WideDeep,
    XDeepFM,
)

SPECS = (
    Feature("user_id", hash_buckets=300),
    Feature("item_id", hash_buckets=400),
    Feature("tags", vocab=tuple(range(18)), max_len=4),
)


def _batch(rng, b=32):
    return {
        "user_id": rng.integers(0, 300, b).astype(np.int32),
        "item_id": rng.integers(0, 400, b).astype(np.int32),
        "tags": rng.integers(0, 18, (b, 4)).astype(np.int32),
        "tags__wt": (rng.random((b, 4)) < 0.8).astype(np.float32),
    }


MODELS = {
    "fm": lambda dt: FactorizationMachine(SPECS, embedding_dim=8,
                                          compute_dtype=dt),
    "deepfm": lambda dt: DeepFM(SPECS, embedding_dim=8, hidden=(16,),
                                compute_dtype=dt),
    "fnn": lambda dt: FNN(SPECS, embedding_dim=8, hidden=(16,),
                          compute_dtype=dt),
    "wdl": lambda dt: WideDeep(deep_specs=SPECS, wide_specs=SPECS,
                               embedding_dim=8, hidden=(16,),
                               compute_dtype=dt),
    "dcn": lambda dt: DCN(SPECS, embedding_dim=8, num_cross_layers=2,
                          hidden=(16,), compute_dtype=dt),
    "xdeepfm": lambda dt: XDeepFM(SPECS, embedding_dim=8,
                                  cin_feature_maps=(8,), hidden=(16,),
                                  compute_dtype=dt),
}


@pytest.mark.parametrize("name", sorted(MODELS))
def test_bf16_params_fp32_logits_fp32(name, rng):
    batch = _batch(rng)
    model = MODELS[name](jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), batch)
    # Params stay fp32 (master weights).
    for leaf in jax.tree.leaves(params):
        assert leaf.dtype == jnp.float32, leaf.dtype
    logits = model.apply(params, batch)
    assert logits.dtype == jnp.float32
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("name", ["deepfm"])
def test_bf16_close_to_fp32_forward(name, rng):
    batch = _batch(rng)
    m32 = MODELS[name](None)
    m16 = MODELS[name](jnp.bfloat16)
    params = m32.init(jax.random.PRNGKey(0), batch)
    l32 = np.asarray(m32.apply(params, batch))
    l16 = np.asarray(m16.apply(params, batch))
    # bf16 has ~3 decimal digits; logits are O(1) here.
    np.testing.assert_allclose(l16, l32, rtol=0.05, atol=0.05)


def test_transformer_bf16_params_fp32_logits_fp32(rng):
    from deep_recommenders_tpu.models.nlp import Transformer

    tx = Transformer(
        vocab_size=50, model_dim=16, num_heads=2, num_encoder_layers=1,
        num_decoder_layers=1, ffn_dim=32, dropout=0.0,
        compute_dtype=jnp.bfloat16,
    )
    inp = jnp.asarray(rng.integers(1, 50, (4, 8)))
    tgt = jnp.asarray(rng.integers(1, 50, (4, 8)))
    params = tx.init(jax.random.PRNGKey(0), inp, tgt)
    for leaf in jax.tree.leaves(params):
        assert leaf.dtype == jnp.float32
    logits = tx.apply(params, inp, tgt)
    assert logits.dtype == jnp.float32
    assert np.isfinite(np.asarray(logits)).all()

    # bf16 forward close to fp32 forward with the same params.
    tx32 = Transformer(
        vocab_size=50, model_dim=16, num_heads=2, num_encoder_layers=1,
        num_decoder_layers=1, ffn_dim=32, dropout=0.0,
    )
    l32 = np.asarray(tx32.apply(params, inp, tgt))
    np.testing.assert_allclose(
        np.asarray(logits), l32, rtol=0.1, atol=0.15
    )


def test_bf16_training_reduces_loss(rng):
    batch = _batch(rng, b=64)
    labels = (rng.random((64, 1)) < 0.5).astype(np.float32)
    model = MODELS["deepfm"](jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), batch)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, batch, training=True)
            return optax.sigmoid_binary_cross_entropy(logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # Grads of fp32 params are fp32 even under bf16 compute.
        for leaf in jax.tree.leaves(grads):
            assert leaf.dtype == jnp.float32
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(20):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
