"""Train MMoE on the synthetic two-task regression benchmark.

Mirrors ref examples/train_mmoe_on_synthetic_estimator.py: 512k examples of
dim 256 (ref :10, :88), two MSE losses with per-task scalar reporting
(ref :44-51). The reference's double global_step bump (ref :57-60) and the
gate-count bug are not replicated.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from deep_recommenders_tpu.datasets import SyntheticForMultiTask
from deep_recommenders_tpu.models.multitask import MMoE
from deep_recommenders_tpu.training.losses import mean_squared_error


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-examples", type=int, default=512 * 1000)
    p.add_argument("--example-dim", type=int, default=256)
    p.add_argument("--task-correlation", type=float, default=0.8)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--num-experts", type=int, default=4)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    ds = SyntheticForMultiTask(
        args.num_examples, args.example_dim, p=args.task_correlation,
        seed=args.seed,
    )
    model = MMoE(
        num_tasks=2, num_experts=args.num_experts,
        expert_hidden=(256,), expert_dim=128, tower_hidden=(64,),
    )
    x = jnp.asarray(ds._x)
    y0 = jnp.asarray(ds._y1[:, None])
    y1 = jnp.asarray(ds._y2[:, None])
    params = model.init(jax.random.PRNGKey(args.seed), x[: args.batch_size])
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    batch = args.batch_size

    @jax.jit
    def run_epoch(params, opt_state, perm):
        def body(carry, step):
            params, opt_state = carry
            rows = jax.lax.dynamic_slice_in_dim(perm, step * batch, batch)
            xb, l0, l1 = x[rows], y0[rows], y1[rows]

            def loss_fn(p):
                o0, o1 = model.apply(p, xb)
                loss0 = mean_squared_error(o0, l0)
                loss1 = mean_squared_error(o1, l1)
                return loss0 + loss1, (loss0, loss1)

            (loss, (l0_, l1_)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), jnp.stack([l0_, l1_])

        steps = perm.shape[0] // batch
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(steps)
        )
        return params, opt_state, losses

    t0 = time.perf_counter()
    import numpy as np

    for epoch in range(args.epochs):
        idx = np.random.default_rng(args.seed + epoch).permutation(
            args.num_examples
        )
        n = (args.num_examples // batch) * batch
        perm = jnp.asarray(idx[:n].astype(np.int32))
        params, opt_state, losses = run_epoch(params, opt_state, perm)
        elapsed = time.perf_counter() - t0
        tail = np.asarray(losses[-100:])
        print(
            f"epoch {epoch}: task0 mse {tail[:, 0].mean():.4f} "
            f"task1 mse {tail[:, 1].mean():.4f} "
            f"({(epoch + 1) * n / elapsed:.0f} ex/s)"
        )


if __name__ == "__main__":
    main()
