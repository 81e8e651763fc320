import time, numpy as np, jax, jax.numpy as jnp, optax
from tools.trace_timing import fence
from deep_recommenders_tpu.features import Feature
from deep_recommenders_tpu.models.ranking import DeepFM
from deep_recommenders_tpu.training import Trainer

B = 8192
specs = (
    Feature("user_id", hash_buckets=6040),
    Feature("user_gender", vocab=("F", "M")),
    Feature("user_age", vocab=(1, 18, 25, 35, 45, 50, 56)),
    Feature("user_occupation", vocab=tuple(range(21))),
    Feature("movie_id", hash_buckets=3952),
    Feature("movie_genres", vocab=tuple(range(18)), max_len=6),
)
rng = np.random.default_rng(0)
batch = {
    "user_id": rng.integers(0, 6040, B).astype(np.int32),
    "user_gender": rng.integers(0, 2, B).astype(np.int32),
    "user_age": rng.integers(0, 7, B).astype(np.int32),
    "user_occupation": rng.integers(0, 21, B).astype(np.int32),
    "movie_id": rng.integers(0, 3952, B).astype(np.int32),
    "movie_genres": rng.integers(0, 18, (B, 6)).astype(np.int32),
    "movie_genres__wt": (rng.random((B, 6)) < 0.5).astype(np.float32),
}
labels = (rng.random((B, 1)) < 0.5).astype(np.float32)
batch = jax.device_put(batch); labels = jax.device_put(labels)

model = DeepFM(specs, embedding_dim=16, hidden=(256, 32))
trainer = Trainer(model, optax.adam(1e-3), seed=0)
state = trainer.init(batch)
params = state.params

def timeit(name, fn, *args, iters=200):
    out = fn(*args); fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e6:9.1f} us")
    return dt

fwd = jax.jit(lambda p, b: model.apply(p, b, training=False))
timeit("forward", fwd, params, batch)

def loss_fn(p, b, y):
    logits = model.apply(p, b, training=True)
    return optax.sigmoid_binary_cross_entropy(logits, y).mean()

grad = jax.jit(jax.grad(loss_fn))
timeit("fwd+bwd (grad)", grad, params, batch, labels)

step = jax.jit(trainer.train_step)
s2, l = step(state, batch, labels); fence(l)
t0 = time.perf_counter()
for _ in range(200):
    state, l = step(state, batch, labels)
fence(l)
print(f"{'full train step (jit, per-call)':40s} {(time.perf_counter()-t0)/200*1e6:9.1f} us")

# embedding-only forward/backward
from deep_recommenders_tpu.embedding.engine import fused_embedding_linear
def emb_only(p, b):
    def run(m, b):
        s, lin = fused_embedding_linear(m.embeddings, m.linear, b)
        return (s.sum() + lin.sum())
    return model.apply(p, b, method=run)
emb_grad = jax.jit(jax.grad(emb_only))
timeit("embedding-only fwd+bwd", emb_grad, params, batch)
