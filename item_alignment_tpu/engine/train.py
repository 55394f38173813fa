"""Generic train/eval/predict engine.

One pjit-compiled ``train_step = value_and_grad(model.apply)`` replaces the
per-script epoch loops of the reference (``finetune_text.py:396-492`` and
friends).  Parameters/optimizer state are placed on the mesh via the
``parallel.sharding`` rules; batches ride the ``data`` axis; XLA inserts the
gradient psum.  bf16 compute comes from the model config (replacing the
reference's ``torch.cuda.amp`` fp16).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.training import train_state

from item_alignment_tpu.config import TrainConfig
from item_alignment_tpu.data.datasets import ArrayDataset
from item_alignment_tpu.engine import metrics as M
from item_alignment_tpu.engine.optim import make_optimizer
from item_alignment_tpu.parallel.mesh import create_mesh
from item_alignment_tpu.parallel.sharding import (
    batch_sharding,
    shard_params,
    tree_shardings,
)
from item_alignment_tpu.utils import logger


class TrainState(train_state.TrainState):
    dropout_rng: jax.Array = None


class Trainer:
    """Drives a pair-classifier Linen module over an ArrayDataset.

    The module's ``__call__`` must accept the batch's array keys as kwargs
    plus ``labels=`` and ``deterministic=`` and return a
    ``PairClassifierOutput``.
    """

    def __init__(self, model: nn.Module, config: TrainConfig,
                 mesh=None, params: Optional[Any] = None,
                 example_batch: Optional[Dict[str, np.ndarray]] = None,
                 log_dir: Optional[str] = None):
        self.model = model
        self.config = config
        self.mesh = mesh if mesh is not None else create_mesh(config.mesh)
        self.rng = jax.random.PRNGKey(config.seed)
        self._example_batch = example_batch
        self._params = params
        self.state: Optional[TrainState] = None
        self.best_params: Optional[Any] = None
        self._train_step = None
        self._eval_step = None
        self.scalars = None
        self.eval_writer = None
        if log_dir:
            from item_alignment_tpu.engine.observability import (
                EvalWriter,
                ScalarLogger,
            )
            self.scalars = ScalarLogger(os.path.join(log_dir, "scalars.jsonl"))
            self.eval_writer = EvalWriter(
                os.path.join(log_dir, "eval_results.csv"),
                ["epoch", "step", "loss", "best_f1", "best_threshold"])

    # ------------------------------------------------------------- setup
    def _init_params(self, batch: Dict[str, np.ndarray]) -> Any:
        init_rng, self.rng = jax.random.split(self.rng)
        kwargs = {k: jnp.asarray(v) for k, v in batch.items()}
        variables = self.model.init({"params": init_rng, "dropout": init_rng},
                                    deterministic=True, **kwargs)
        return variables["params"]

    def setup(self, example_batch: Optional[Dict[str, np.ndarray]] = None):
        batch = example_batch or self._example_batch
        assert batch is not None, "need an example batch to initialize"
        params = self._params if self._params is not None else self._init_params(batch)
        params = shard_params(params, self.mesh)
        tx = make_optimizer(self.config.optimizer, params)
        dropout_rng, self.rng = jax.random.split(self.rng)
        state = TrainState.create(apply_fn=self.model.apply, params=params,
                                  tx=tx, dropout_rng=dropout_rng)
        # place the full state (opt moments follow the param shardings)
        data_size = int(self.mesh.shape.get("data", 1))
        for bs_name in ("train_batch_size", "eval_batch_size"):
            bs = getattr(self.config, bs_name)
            assert bs % data_size == 0, (
                f"{bs_name}={bs} must be divisible by the mesh data axis "
                f"({data_size} devices); adjust the batch size or the mesh")
        state_shardings = tree_shardings(state, self.mesh)
        self.state = jax.device_put(state, state_shardings)
        self._state_shardings = state_shardings
        self._batch_sharding = batch_sharding(self.mesh)
        self._compile()
        return self

    def _compile(self):
        model = self.model

        def train_step(state: TrainState, batch: Dict[str, jax.Array]):
            dropout_rng = jax.random.fold_in(state.dropout_rng, state.step)

            def loss_fn(params):
                out = model.apply({"params": params}, deterministic=False,
                                  rngs={"dropout": dropout_rng}, **batch)
                return out.loss

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            state = state.apply_gradients(grads=grads)
            return state, loss

        def eval_step(params, batch):
            out = model.apply({"params": params}, deterministic=True, **batch)
            return out.probs, out.src_embeds, out.tgt_embeds

        self._train_step = jax.jit(train_step, donate_argnums=(0,))
        self._eval_step = jax.jit(eval_step)

    # ------------------------------------------------------------- loops
    def _device_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        return {k: jax.device_put(v, self._batch_sharding) for k, v in batch.items()}

    def train_epoch(self, dataset: ArrayDataset, epoch: int = 0,
                    valid_ds: Optional[ArrayDataset] = None) -> Dict[str, float]:
        cfg = self.config
        if self.state is None:
            first = next(dataset.batches(cfg.train_batch_size))[0]
            self.setup(first)
        losses, t0 = [], time.time()
        steps = 0
        mid_evals = []
        # drop_last: the padded partial batch would duplicate rows into the
        # gradient (datasets.py pads by repeating); shuffling re-covers the
        # dropped tail across epochs
        for batch, _ in dataset.batches(cfg.train_batch_size, shuffle=True,
                                        seed=cfg.seed + epoch, drop_last=True):
            self.state, loss = self._train_step(self.state, self._device_batch(batch))
            steps += 1
            if steps % cfg.log_steps == 0:
                losses.append(float(loss))
                logger.info(f"epoch {epoch} step {steps} loss {losses[-1]:.4f} "
                            f"({(time.time()-t0)/steps:.3f}s/step)")
                if self.scalars is not None:
                    self.scalars.add_scalar("train/loss", losses[-1],
                                            int(self.state.step))
            if (cfg.eval_every_steps and valid_ds is not None
                    and steps % cfg.eval_every_steps == 0):
                ev = self.evaluate(valid_ds)
                mid_evals.append({"step": steps, "best_f1": ev.get("best_f1")})
                logger.info(f"epoch {epoch} step {steps} "
                            f"eval f1 {ev.get('best_f1', float('nan')):.4f}")
        final_loss = float(loss) if steps else float("nan")
        out = {"epoch": epoch, "steps": steps, "loss": final_loss,
               "wall_s": time.time() - t0}
        if mid_evals:
            out["mid_evals"] = mid_evals
        return out

    def evaluate(self, dataset: ArrayDataset) -> Dict[str, Any]:
        cfg = self.config
        probs_all, labels_all = [], []
        for batch, meta in dataset.batches(cfg.eval_batch_size):
            labels = batch.pop("labels", None)
            probs, _, _ = self._eval_step(self.state.params, self._device_batch(batch))
            n = meta["n_valid"]
            probs_all.append(np.asarray(probs)[:n])
            if labels is not None:
                labels_all.append(np.asarray(labels)[:n])
        probs = np.concatenate(probs_all) if probs_all else np.zeros(0)
        result: Dict[str, Any] = {"probs": probs}
        if labels_all:
            labels = np.concatenate(labels_all)
            sweep = M.threshold_sweep(labels, probs, cfg.eval_thresholds)
            best_f1, best_p, best_r, best_thr = M.find_best_f1_and_threshold(labels, probs)
            result.update(labels=labels, sweep=sweep, best_f1=best_f1,
                          best_precision=best_p, best_recall=best_r,
                          best_threshold=best_thr)
        return result

    def predict_jsonl(self, dataset: ArrayDataset, path: str,
                      threshold: Optional[float] = None) -> str:
        """Write predictions in the reference submission format
        (``finetune_text.py:784-792``): probabilities smuggled as 1-d
        "embeddings"; the scorer reads ``tgt_item_emb[0]``."""
        cfg = self.config
        threshold = cfg.threshold if threshold is None else threshold
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w", encoding="utf-8") as w:
            for batch, meta in dataset.batches(cfg.eval_batch_size):
                batch.pop("labels", None)
                _, src_emb, tgt_emb = self._eval_step(
                    self.state.params, self._device_batch(batch))
                src_emb, tgt_emb = np.asarray(src_emb), np.asarray(tgt_emb)
                n = meta["n_valid"]
                src_ids = meta.get("src_item_id", [""] * n)
                tgt_ids = meta.get("tgt_item_id", [""] * n)
                for i in range(n):
                    se, te = src_emb[i], tgt_emb[i]
                    se_s = ",".join(str(x) for x in np.atleast_1d(se)) \
                        if se.ndim else str(se)
                    te_s = ",".join(str(x) for x in np.atleast_1d(te)) \
                        if te.ndim else str(te)
                    row = {"src_item_id": src_ids[i], "src_item_emb": f"[{se_s}]",
                           "tgt_item_id": tgt_ids[i], "tgt_item_emb": f"[{te_s}]",
                           "threshold": threshold}
                    w.write(json.dumps(row) + "\n")
        return path

    def fit(self, train_ds: ArrayDataset, valid_ds: Optional[ArrayDataset] = None
            ) -> Dict[str, Any]:
        """Epoch loop with per-epoch (or per-N-steps) threshold-sweep eval,
        best-F1 tracking and optional early stopping by eval patience
        (finetune_bert.py:584-592)."""
        cfg = self.config
        history = []
        best = {"best_f1": 0.0, "epoch": -1, "params": None}
        stale_evals = 0
        for epoch in range(cfg.num_epochs):
            stats = self.train_epoch(train_ds, epoch, valid_ds)
            if valid_ds is not None:
                ev = self.evaluate(valid_ds)
                stats.update(best_f1=ev.get("best_f1"),
                             best_threshold=ev.get("best_threshold"))
                if ev.get("best_f1", 0.0) > best["best_f1"]:
                    best = {"best_f1": ev["best_f1"], "epoch": epoch,
                            "threshold": ev.get("best_threshold"),
                            "params": jax.tree.map(np.asarray,
                                                   self.state.params)}
                    stale_evals = 0
                else:
                    stale_evals += 1
                logger.info(f"epoch {epoch}: loss {stats['loss']:.4f} "
                            f"f1 {ev.get('best_f1', float('nan')):.4f}")
                if self.eval_writer is not None:
                    self.eval_writer.write(
                        epoch=epoch, step=int(self.state.step),
                        loss=stats["loss"], best_f1=ev.get("best_f1"),
                        best_threshold=ev.get("best_threshold"))
                if self.scalars is not None:
                    self.scalars.add_scalar("eval/best_f1",
                                            ev.get("best_f1", 0.0),
                                            int(self.state.step))
                if (cfg.early_stopping_patience is not None
                        and stale_evals >= cfg.early_stopping_patience):
                    logger.info(f"early stopping after {stale_evals} stale evals")
                    history.append(stats)
                    break
            history.append(stats)
        best_params = best.pop("params", None)
        if best_params is not None:
            self.best_params = best_params
        return {"history": history, "best": best}
