"""Jitted training loop: the tf.estimator / keras-fit replacement.

The reference delegates the loop to TF (session loop + RunConfig in the
estimator branch, model.fit in keras; SURVEY §1.4/§3.1). Here the loop is
explicit and TPU-shaped:

- one jitted ``train_step`` (donated state, loss from logits, optax update),
  traced once thanks to static batch shapes;
- eval metrics update INSIDE the jitted eval step;
- data-parallel by construction: batches are device_put with the leading dim
  sharded over the mesh "data" axis and params replicated/sharded by GSPMD —
  gradient psum is inserted by XLA, not hand-written;
- early stopping + per-step examples/sec, the north-star metric
  (BASELINE.md) the reference never measured.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import shutil
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from deep_recommenders_tpu.parallel.sharding import shard_batch
from deep_recommenders_tpu.training.evaluation import BinaryCTREval
from deep_recommenders_tpu.training.losses import binary_cross_entropy


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: s.tree_flatten(),
    TrainState.tree_unflatten,
)


LossFn = Callable[..., jax.Array]


def _monitor_value(summary: Dict[str, Any], monitor: str, mode: str) -> float:
    """Scalar driving early stopping / best-model selection.

    ``monitor="auto"`` keeps the CTR default (AUC if present, else -val_loss
    — ref keras EarlyStopping over the compiled metrics); any other name
    selects that summary key, maximized (``mode="max"``) or minimized
    (``mode="min"`` — e.g. multitask MSE, retrieval val_loss).
    """
    if monitor == "auto":
        if "auc" in summary:
            return summary["auc"]
        return -summary.get("val_loss", summary["loss"])
    if monitor not in summary:
        raise KeyError(
            f"early-stop monitor {monitor!r} not in epoch summary "
            f"{sorted(summary)}"
        )
    value = summary[monitor]
    return -value if mode == "min" else value


def bce_loss(model) -> LossFn:
    """Default CTR loss: sigmoid BCE on the model's logits."""

    def loss_fn(params, batch, labels, rngs=None):
        logits = model.apply(params, batch, training=True, rngs=rngs)
        return binary_cross_entropy(logits, labels)

    return loss_fn


class Trainer:
    """Minimal fit/evaluate driver around jitted steps."""

    def __init__(
        self,
        model,
        optimizer: optax.GradientTransformation,
        loss_fn: Optional[LossFn] = None,
        mesh: Optional[Mesh] = None,
        seed: int = 42,
        has_dropout: bool = False,
        eval_spec=None,
    ):
        """``loss_fn(params, batch, labels, rngs) -> scalar`` defaults to
        sigmoid BCE on the model's logits; ``eval_spec`` (an object with
        jit-safe init/update + host compute — see training/evaluation.py)
        defaults to the CTR program (AUC/P/R/val_loss). Together they make
        the SAME fit/fit_device loop serve multitask (MMoE/ESMM) and
        two-tower models, not just binary CTR."""
        self.model = model
        self.optimizer = optimizer
        self.loss_fn = loss_fn or bce_loss(model)
        self.mesh = mesh
        self.seed = seed
        self.has_dropout = has_dropout
        self.eval_spec = eval_spec or BinaryCTREval(model)
        # Pytree of shardings pinning the train-step OUTPUT state layout to
        # the input's (see set_state_constraint). Without it, GSPMD is free
        # to emit the updated params replicated — flipping a mesh-sharded
        # embedding table to P() every step and forcing a host-visible
        # reshard per dispatch (measured 84ms/step vs 140us on v5e).
        self._state_constraint = None
        self._train_step_jit = None
        self._build_steps()

    # -- state ------------------------------------------------------------
    def init(self, sample_batch) -> TrainState:
        batch = jax.tree.map(jnp.asarray, sample_batch)
        # Tuple batches (e.g. two-tower's (query_batch, candidate_batch))
        # unpack into the model's positional args.
        args = batch if isinstance(batch, tuple) else (batch,)
        params = self.model.init(
            jax.random.PRNGKey(self.seed), *args, training=False
        )
        opt_state = self.optimizer.init(params)
        return TrainState(
            params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32)
        )

    # -- sharding stability ------------------------------------------------
    def set_state_constraint(self, state: TrainState) -> None:
        """Pin the train step's output-state shardings to ``state``'s.

        Call after placing params on the mesh (e.g. row-sharding the
        embedding table) and before tracing any step/scan. Mesh
        (NamedSharding) placements are kept; every other leaf is pinned
        replicated. No-op without a mesh.

        Why pinning matters: without it GSPMD may emit the updated state
        with a *different but equivalent* spec (e.g. the row-sharded table
        comes back as PartitionSpec()), and the next dispatch — whose input
        signature no longer matches — silently RECOMPILES the step (measured
        2.5-18 s once per flip on v5e). The constraint is applied inside the
        step (stable lax.scan carry) AND as jit out_shardings (stable
        dispatch signature).
        """
        if self.mesh is None:
            return
        replicated = NamedSharding(self.mesh, PartitionSpec())
        self._state_constraint = jax.tree.map(
            lambda x: x.sharding
            if isinstance(getattr(x, "sharding", None), NamedSharding)
            else replicated,
            state,
        )

    def output_shardings(self):
        """``(state_shardings, replicated)`` to pin a step/scan jit's
        out_shardings (second slot = loss/aux). None without a mesh or
        before :meth:`set_state_constraint`."""
        if self._state_constraint is None:
            return None
        return (
            self._state_constraint,
            NamedSharding(self.mesh, PartitionSpec()),
        )

    def place_state(self, state: TrainState) -> TrainState:
        """Place ``state`` exactly on the pinned shardings (captures them
        first if needed). Use before hand-rolled jit/scan loops so the first
        dispatch already has the steady-state signature — mixed
        single-device/NamedSharding leaves otherwise compile a one-off
        executable that the second dispatch can't reuse."""
        if self._state_constraint is None:
            self.set_state_constraint(state)
        if self._state_constraint is None:  # no mesh
            return state
        return jax.device_put(state, self._state_constraint)

    def _apply_state_constraint(self, state: TrainState) -> TrainState:
        if self._state_constraint is None:
            return state
        return jax.tree.map(
            lambda x, s: (
                jax.lax.with_sharding_constraint(x, s)
                if isinstance(s, NamedSharding)
                else x
            ),
            state,
            self._state_constraint,
        )

    # -- jitted steps -----------------------------------------------------
    def _build_steps(self):
        loss_fn, optimizer = self.loss_fn, self.optimizer
        has_dropout, seed = self.has_dropout, self.seed

        def train_step(state: TrainState, batch, labels):
            rngs = None
            if has_dropout:
                rngs = {
                    "dropout": jax.random.fold_in(
                        jax.random.PRNGKey(seed), state.step
                    )
                }
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, batch, labels, rngs
            )
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                params=params, opt_state=opt_state, step=state.step + 1
            )
            return self._apply_state_constraint(new_state), loss

        eval_spec = self.eval_spec

        def eval_step(params, batch, labels, metric_state):
            return eval_spec.update(params, batch, labels, metric_state)

        self.train_step_fn = train_step  # unjitted (for scan/custom loops)

        def train_step_dispatch(state, batch, labels):
            # Lazy jit: capture the concrete state's mesh shardings on first
            # call and pin them as out_shardings, so the output state keeps
            # the input signature (stable layout, donation aliases cleanly,
            # and — critically — NO silent recompile on the second dispatch
            # from an output-spec flip).
            if self._train_step_jit is None:
                # Place the first state exactly on the pinned shardings so
                # call 1 and call 2 share one executable (otherwise mixed
                # single-device/NamedSharding input leaves make the first
                # signature unique -> one wasted recompile).
                state = self.place_state(state)
                out = self.output_shardings()
                self._train_step_jit = jax.jit(
                    train_step,
                    donate_argnums=(0,),
                    **({"out_shardings": out} if out is not None else {}),
                )
            return self._train_step_jit(state, batch, labels)

        self.train_step = train_step_dispatch
        # No donation for eval: metric states are tiny, and freshly-init
        # zeros can alias the same cached constant buffer.
        self.eval_step = jax.jit(eval_step)

    # -- drivers ----------------------------------------------------------
    def _put(self, batch):
        return shard_batch(batch, self.mesh)

    def fit(
        self,
        train_batches: Callable[[], Iterable[Tuple[Dict, Any]]],
        eval_batches: Optional[Callable[[], Iterable[Tuple[Dict, Any]]]] = None,
        epochs: int = 1,
        early_stopping_patience: Optional[int] = None,
        monitor: str = "auto",
        monitor_mode: str = "max",
        log_every: int = 100,
        verbose: bool = True,
    ) -> Dict[str, Any]:
        import inspect

        # epoch-aware batch factories get the epoch index, so shuffles can
        # differ per epoch (keras reshuffle_each_iteration semantics)
        takes_epoch = bool(inspect.signature(train_batches).parameters)
        # Multi-host: every process runs the same loop on its own local
        # slice of each global batch (shard_batch assembles the global
        # arrays); only process 0 narrates.
        verbose = verbose and jax.process_index() == 0
        state = None
        history = []
        best_metric, best_epoch = -float("inf"), -1
        examples = 0
        t0 = time.perf_counter()
        for epoch in range(epochs):
            epoch_batches = (
                train_batches(epoch) if takes_epoch else train_batches()
            )
            for batch, labels in epoch_batches:
                batch = self._put(batch)
                labels = self._put(labels)
                if state is None:
                    state = self.init(batch)
                state, loss = self.train_step(state, batch, labels)
                # Labels may be a pytree or None (e.g. two-tower); count the
                # batch's leading dim from whichever side has leaves.
                leaves = jax.tree.leaves(labels) or jax.tree.leaves(batch)
                examples += leaves[0].shape[0]
                step = int(state.step)
                if verbose and log_every and step % log_every == 0:
                    elapsed = time.perf_counter() - t0
                    print(
                        f"step {step} loss {float(loss):.4f} "
                        f"({examples / elapsed:.0f} ex/s)"
                    )
            if state is None:
                raise ValueError(
                    "train_batches yielded no batches (corpus smaller than "
                    "one batch?) — nothing to train on"
                )
            epoch_summary = {"epoch": epoch, "loss": float(loss)}
            if eval_batches is not None:
                epoch_summary.update(self.evaluate(state.params, eval_batches))
                metric = _monitor_value(epoch_summary, monitor, monitor_mode)
                if metric > best_metric:
                    best_metric, best_epoch = metric, epoch
                elif (
                    early_stopping_patience is not None
                    and epoch - best_epoch >= early_stopping_patience
                ):
                    history.append(epoch_summary)
                    break
            history.append(epoch_summary)
            if verbose:
                print({k: round(v, 4) if isinstance(v, float) else v
                       for k, v in epoch_summary.items()})
        elapsed = time.perf_counter() - t0
        return {
            "state": state,
            "history": history,
            "examples_per_sec": examples / elapsed,
        }

    # -- device-resident fast path ---------------------------------------
    def fit_device(
        self,
        train_data,
        eval_data=None,
        epochs: int = 1,
        shuffle_seed: Optional[int] = 42,
        early_stopping_patience: Optional[int] = None,
        monitor: str = "auto",
        monitor_mode: str = "max",
        checkpoint_dir: Optional[str] = None,
        checkpoint_every_epochs: int = 1,
        keep_checkpoint_max: int = 10,
        verbose: bool = True,
    ) -> Dict[str, Any]:
        """Epochs as single jitted lax.scan calls over DeviceData.

        Removes the per-step host round trip entirely: one dispatch per
        epoch, data gathered on-device from the resident split.
        """
        import jax.numpy as jnp

        verbose = verbose and jax.process_index() == 0

        from deep_recommenders_tpu.training.data import gather_rows

        train_step_fn = self.train_step_fn
        batch = train_data.batch_size

        # The resident split is passed as an ARGUMENT (train_data.arrays()),
        # never closure-captured: captured device arrays lower to literal
        # HLO constants, which bloats compiles and overflows the
        # remote-compile request at large-corpus scale (seen at MMoE's
        # 512k x 256 f32 split: HTTP 413 from the compile tunnel).
        def run_epoch_raw(state, perm, data):
            feats, lbls = data
            steps = perm.shape[0] // batch

            def body(state, step):
                rows = jax.lax.dynamic_slice_in_dim(
                    perm, step * batch, batch
                )
                b, l = gather_rows(feats, lbls, rows)
                state, loss = train_step_fn(state, b, l)
                return state, loss

            return jax.lax.scan(body, state, jnp.arange(steps))

        eval_spec = self.eval_spec

        @jax.jit
        def run_eval(params, perm, data):
            feats, lbls = data
            steps = perm.shape[0] // batch

            def body(mstate, step):
                rows = jax.lax.dynamic_slice_in_dim(
                    perm, step * batch, batch
                )
                b, labels = gather_rows(feats, lbls, rows)
                return eval_spec.update(params, b, labels, mstate), None

            mstate, _ = jax.lax.scan(
                body, eval_spec.init(), jnp.arange(steps)
            )
            return mstate

        # Init from the first batch — or resume from the latest checkpoint
        # (RunConfig-style implicit resume from model_dir, SURVEY §5.4).
        first_rows = train_data.permutation(None, 0)[:batch]
        first_batch, _ = train_data.gather(first_rows)
        state = self.init(first_batch)
        start_epoch = 0
        saved_ckpts = []
        if checkpoint_dir is not None:
            from deep_recommenders_tpu.training.checkpoints import (
                list_step_dirs,
                restore_checkpoint,
            )

            # Rescan surviving checkpoints so keep_checkpoint_max holds
            # across restarts (not just within one run).
            saved_ckpts = list_step_dirs(checkpoint_dir)
            if saved_ckpts:
                latest = saved_ckpts[-1]
                state = restore_checkpoint(latest, state)
                start_epoch = int(
                    os.path.basename(latest).split("_")[1]
                ) + 1
                if verbose:
                    print(f"resumed from {latest} (epoch {start_epoch})")
        # Jit AFTER the constraint exists: pinned out_shardings keep every
        # epoch dispatch on the same executable (no spec-flip recompile),
        # and the initial state is placed on the same shardings so epoch 0
        # shares the executable too.
        state = self.place_state(state)
        out = self.output_shardings()
        run_epoch = jax.jit(
            run_epoch_raw,
            donate_argnums=(0,),
            **({"out_shardings": out} if out is not None else {}),
        )

        history = []
        best_metric, best_epoch = -float("inf"), -1
        t0 = time.perf_counter()
        examples = 0
        # Steady-state window: from after the FIRST epoch fully completes
        # (one-time trace + XLA compile — minutes through the remote-compile
        # tunnel — plus its execution) to the end of the last epoch.
        # examples_per_sec_steady is the device-resident training rate;
        # examples_per_sec keeps full wall-clock semantics. Fencing note:
        # jax.block_until_ready does NOT reliably wait on the remote-
        # dispatch (axon) backend — a concrete VALUE fetch (float()) is the
        # only trustworthy fence, and the per-epoch summary below performs
        # one, so the timestamps are taken right after it.
        t_steady = None
        examples_steady = 0
        for epoch in range(start_epoch, epochs):
            perm = train_data.permutation(shuffle_seed, epoch)
            state, losses = run_epoch(state, perm, train_data.arrays())
            examples += int(perm.shape[0])
            if t_steady is not None:
                examples_steady += int(perm.shape[0])
            if (
                checkpoint_dir is not None
                and (epoch + 1) % checkpoint_every_epochs == 0
            ):
                from deep_recommenders_tpu.training.checkpoints import (
                    save_checkpoint,
                )

                path = save_checkpoint(
                    os.path.join(checkpoint_dir, f"step_{epoch}"), state
                )
                saved_ckpts.append(path)
                while len(saved_ckpts) > keep_checkpoint_max:
                    old = saved_ckpts.pop(0)
                    shutil.rmtree(old, ignore_errors=True)
            summary = {"epoch": epoch, "loss": float(losses[-1])}
            if t_steady is None:  # first epoch fully done (float() fenced)
                t_steady = time.perf_counter()
            t_last = time.perf_counter()
            if eval_data is not None:
                eval_perm = eval_data.permutation(None, 0)
                mstate = run_eval(
                    state.params, eval_perm, eval_data.arrays()
                )
                summary.update(eval_spec.compute(mstate))
                metric = _monitor_value(summary, monitor, monitor_mode)
                if metric > best_metric:
                    best_metric, best_epoch = metric, epoch
                elif (
                    early_stopping_patience is not None
                    and epoch - best_epoch >= early_stopping_patience
                ):
                    history.append(summary)
                    break
            history.append(summary)
            if verbose:
                elapsed = time.perf_counter() - t0
                print(
                    {k: round(v, 4) if isinstance(v, float) else v
                     for k, v in summary.items()},
                    f"[{examples / elapsed:.0f} ex/s]",
                )
        elapsed = time.perf_counter() - t0
        result = {
            "state": state,
            "history": history,
            "examples_per_sec": examples / elapsed,
        }
        if t_steady is not None and examples_steady > 0:
            # Eval/checkpoint time between epochs is included — this is the
            # steady-state rate of the whole epoch loop, minus compiles.
            # t_last was fenced by the final epoch's float(loss) fetch.
            result["examples_per_sec_steady"] = examples_steady / (
                t_last - t_steady
            )
        return result

    def evaluate(self, params, eval_batches) -> Dict[str, float]:
        metric_state = self.eval_spec.init()
        for batch, labels in eval_batches():
            batch = self._put(batch)
            labels = self._put(labels)
            metric_state = self.eval_step(params, batch, labels, metric_state)
        return self.eval_spec.compute(metric_state)
