"""Train MMoE on the synthetic two-task regression benchmark.

Mirrors ref examples/train_mmoe_on_synthetic_estimator.py: 512k examples of
dim 256 (ref :10, :88), two MSE losses with per-task scalar reporting
(ref :44-51). The reference's double global_step bump (ref :57-60) and the
gate-count bug are not replicated.

Runs through the shared Trainer (device-resident epoch scan, per-task MSE
eval, checkpoint/resume via --checkpoint-dir) — the same fit_device loop
the CTR models use, with loss_fn=multitask_mse_loss and
eval_spec=MultiTaskMSEEval.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import optax

from deep_recommenders_tpu.datasets import SyntheticForMultiTask
from deep_recommenders_tpu.models.multitask import MMoE
from deep_recommenders_tpu.training import (
    DeviceData,
    MultiTaskMSEEval,
    Trainer,
    multitask_mse_loss,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-examples", type=int, default=512 * 1000)
    p.add_argument("--example-dim", type=int, default=256)
    p.add_argument("--task-correlation", type=float, default=0.8)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--num-experts", type=int, default=4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--eval-fraction", type=float, default=0.1)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--out", default=None, help="write a result-JSON artifact")
    args = p.parse_args()

    ds = SyntheticForMultiTask(
        args.num_examples, args.example_dim, p=args.task_correlation,
        seed=args.seed,
    )
    x = np.asarray(ds._x, np.float32)
    labels = np.stack([ds._y1, ds._y2], axis=1).astype(np.float32)
    n_eval = int(args.num_examples * args.eval_fraction)
    train = DeviceData.from_numpy(
        x[n_eval:], labels[n_eval:], batch_size=args.batch_size
    )
    evald = DeviceData.from_numpy(
        x[:n_eval], labels[:n_eval], batch_size=args.batch_size
    )

    model = MMoE(
        num_tasks=2, num_experts=args.num_experts,
        expert_hidden=(256,), expert_dim=128, tower_hidden=(64,),
    )
    trainer = Trainer(
        model,
        optax.adam(1e-3),
        loss_fn=multitask_mse_loss(model, num_tasks=2),
        eval_spec=MultiTaskMSEEval(model, num_tasks=2),
        seed=args.seed,
    )
    result = trainer.fit_device(
        train,
        eval_data=evald,
        epochs=args.epochs,
        shuffle_seed=args.seed,
        monitor="val_loss",
        monitor_mode="min",
        checkpoint_dir=args.checkpoint_dir,
    )
    last = result["history"][-1]
    print(
        f"final: task0 mse {last['mse_0']:.4f} task1 mse {last['mse_1']:.4f} "
        f"({result['examples_per_sec']:.0f} ex/s)"
    )
    if args.out:
        import json

        with open(args.out, "w") as f:
            json.dump(
                {
                    "model": "MMoE",
                    "config": {
                        "num_examples": args.num_examples,
                        "example_dim": args.example_dim,
                        "task_correlation": args.task_correlation,
                        "epochs": args.epochs,
                        "batch_size": args.batch_size,
                        "num_experts": args.num_experts,
                        "seed": args.seed,
                        "optimizer": "adam(1e-3)",
                    },
                    "mse_task0": round(float(last["mse_0"]), 6),
                    "mse_task1": round(float(last["mse_1"]), 6),
                    "examples_per_sec_per_chip": round(
                        result["examples_per_sec"], 0
                    ),
                },
                f,
                indent=1,
            )


if __name__ == "__main__":
    main()
