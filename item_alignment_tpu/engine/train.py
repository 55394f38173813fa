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
    put_global_batch,
    replicated,
    shard_params,
    tree_shardings,
)


def _host_copy(tree) -> Any:
    """Pytree -> host numpy.  Multi-host: all-gather any leaf whose shards
    span other hosts' devices first (a plain np.asarray on such an array
    raises)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        def leaf(x):
            if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
                return multihost_utils.process_allgather(x, tiled=True)
            return np.asarray(x)

        return jax.tree.map(leaf, tree)
    return jax.tree.map(np.asarray, tree)
from item_alignment_tpu.utils import logger
from item_alignment_tpu.utils.retry import retry_transient


class TrainState(train_state.TrainState):
    dropout_rng: jax.Array = None
    deltas: Any = None  # adversarial embedding-noise state (FREE/PGD/MIX)


def _loss_of(out) -> jax.Array:
    """Normalize module outputs: PairClassifierOutput / dict / bare scalar."""
    if hasattr(out, "loss"):
        return out.loss
    if isinstance(out, dict):
        return out["loss"]
    return out


class Trainer:
    """Drives a Linen module over an ArrayDataset.

    By default the module's ``__call__`` accepts the batch's array keys as
    kwargs plus ``labels=`` and ``deterministic=`` and returns a
    ``PairClassifierOutput``; ``batch_transform`` (a pure function applied
    inside jit) adapts batches for modules with a different signature, and
    modules may also return a {"loss": ...} dict or a bare scalar loss
    (pretraining objectives).

    ``adversarial=(mode, epsilon, alpha)`` + ``noise_spec={kwarg_name:
    per-example shape}`` enables FREE/PGD/MIX embedding-noise training as a
    Trainer feature (the deltas live in the TrainState), replacing the
    reference's hand-rolled loop (``finetune_bert.py:425-512``).
    """

    def __init__(self, model: nn.Module, config: TrainConfig,
                 mesh=None, params: Optional[Any] = None,
                 example_batch: Optional[Dict[str, np.ndarray]] = None,
                 log_dir: Optional[str] = None,
                 batch_transform: Optional[Callable] = None,
                 adversarial: Optional[Tuple[str, float, float]] = None,
                 noise_spec: Optional[Dict[str, Tuple[int, ...]]] = None):
        self.model = model
        self.config = config
        self.batch_transform = batch_transform or (lambda b: b)
        self.adversarial = adversarial
        self.noise_spec = noise_spec or {}
        assert not (adversarial and not self.noise_spec), \
            "adversarial training needs a noise_spec"
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
        kwargs = self.batch_transform(
            {k: jnp.asarray(v) for k, v in batch.items()})
        variables = self.model.init({"params": init_rng, "dropout": init_rng},
                                    deterministic=True, **kwargs)
        return variables["params"]

    def setup(self, example_batch: Optional[Dict[str, np.ndarray]] = None):
        batch = example_batch or self._example_batch
        assert batch is not None, "need an example batch to initialize"
        params = self._params if self._params is not None else self._init_params(batch)
        params = shard_params(params, self.mesh)
        tx = make_optimizer(self.config.optimizer, params)
        seed_rng, self.rng = jax.random.split(self.rng)
        # raw key DATA for the dropout stream (wrapped to a typed key with
        # config.dropout_rng_impl inside the jitted step): the default
        # threefry generator spends ~30% of the flagship train step
        # generating dropout bits on the VPU; "rbg" uses the TPU hardware
        # RNG.  Kept as a plain uint32 array so multi-host device_put and
        # checkpointing treat it like any other state leaf.
        n_words = 4 if self.config.dropout_rng_impl == "rbg" else 2
        dropout_rng = jax.random.bits(seed_rng, (n_words,), jnp.uint32)
        deltas = None
        if self.adversarial:
            deltas = {name: jnp.zeros((self.config.train_batch_size,) + shape)
                      for name, shape in self.noise_spec.items()}
        state = TrainState.create(apply_fn=self.model.apply, params=params,
                                  tx=tx, dropout_rng=dropout_rng,
                                  deltas=deltas)
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
        transform = self.batch_transform
        adversarial = self.adversarial
        rng_impl = self.config.dropout_rng_impl

        def train_step(state: TrainState, batch: Dict[str, jax.Array]):
            base_key = jax.random.wrap_key_data(state.dropout_rng,
                                                impl=rng_impl)
            dropout_rng = jax.random.fold_in(base_key, state.step)
            kwargs = transform(batch)

            if adversarial:
                from item_alignment_tpu.engine.adversarial import update_deltas

                mode, epsilon, alpha = adversarial

                def loss_fn(params, deltas):
                    out = model.apply({"params": params}, deterministic=False,
                                      rngs={"dropout": dropout_rng},
                                      **kwargs, **deltas)
                    return _loss_of(out)

                loss, (grads, dgrads) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1))(state.params, state.deltas)
                delta_rng = jax.random.fold_in(dropout_rng, 1)
                new_deltas = update_deltas(mode, delta_rng, state.deltas,
                                           dgrads, epsilon, alpha)
                state = state.apply_gradients(grads=grads)
                state = state.replace(deltas=new_deltas)
                return state, loss

            def loss_fn(params):
                out = model.apply({"params": params}, deterministic=False,
                                  rngs={"dropout": dropout_rng}, **kwargs)
                return _loss_of(out)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            state = state.apply_gradients(grads=grads)
            return state, loss

        def eval_step(params, batch):
            out = model.apply({"params": params}, deterministic=True,
                              **transform(batch))
            return out.probs, out.src_embeds, out.tgt_embeds

        self._train_step = jax.jit(train_step, donate_argnums=(0,))

        def train_scan(state: TrainState, batches: Dict[str, jax.Array]):
            """K steps per dispatch (batches leaves are [K, B, ...]):
            amortizes the per-dispatch round trip, which through a remote
            TPU costs more than the step compute itself."""
            state, losses = jax.lax.scan(train_step, state, batches)
            return state, losses

        self._train_scan = jax.jit(train_scan, donate_argnums=(0,))
        # eval outputs are fetched on every host: replicate them inside the
        # jit (all-gather over the data axis) so np.asarray stays legal on
        # multi-host meshes
        self._eval_step = jax.jit(eval_step,
                                  out_shardings=replicated(self.mesh))

    # ------------------------------------------------------------- loops
    def _device_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        # multi-host: each process transfers only its process_slice of the
        # global batch (per-host data path, SURVEY.md §5.8)
        return {k: put_global_batch(self._batch_sharding, v)
                for k, v in batch.items()}

    def _device_scan_batches(self, batches) -> Dict[str, jax.Array]:
        """Stack K host batches to [K, B, ...] leaves, batch dim sharded
        over the data axis (dim 0 is the scan axis, replicated)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from item_alignment_tpu.parallel.mesh import AXIS_DATA
        from item_alignment_tpu.parallel.sharding import process_slice

        sh = NamedSharding(self.mesh, P(None, AXIS_DATA))
        out = {}
        for k in batches[0]:
            v = np.stack([b[k] for b in batches])
            if jax.process_count() == 1:
                out[k] = jax.device_put(v, sh)
            else:
                local = v[:, process_slice(v.shape[1])]
                out[k] = jax.make_array_from_process_local_data(sh, local,
                                                                v.shape)
        return out

    def train_epoch(self, dataset: ArrayDataset, epoch: int = 0,
                    valid_ds: Optional[ArrayDataset] = None) -> Dict[str, float]:
        cfg = self.config
        if self.state is None:
            first = next(dataset.batches(cfg.train_batch_size))[0]
            self.setup(first)
        losses, t0 = [], time.time()
        steps = 0
        mid_evals = []
        loss = None
        # device-side scan over chunks of K steps (one dispatch per chunk);
        # chunk divides the eval cadence so step-based eval fires exactly
        chunk = max(int(cfg.scan_steps), 1)
        if cfg.eval_every_steps:
            while cfg.eval_every_steps % chunk:
                chunk -= 1

        def run_chunk(pending):
            nonlocal steps, loss
            if len(pending) == 1:
                self.state, loss = self._train_step(
                    self.state, self._device_batch(pending[0]))
            else:
                self.state, chunk_losses = self._train_scan(
                    self.state, self._device_scan_batches(pending))
                loss = chunk_losses[-1]
            prev = steps
            steps += len(pending)
            if steps // cfg.log_steps > prev // cfg.log_steps:
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

        # drop_last: the padded partial batch would duplicate rows into the
        # gradient (datasets.py pads by repeating); shuffling re-covers the
        # dropped tail across epochs
        pending = []
        for batch, _ in dataset.batches(cfg.train_batch_size, shuffle=True,
                                        seed=cfg.seed + epoch, drop_last=True):
            pending.append(batch)
            if len(pending) == chunk:
                run_chunk(pending)
                pending = []
        # remainder steps run one dispatch each (shapes stay fixed)
        for batch in pending:
            run_chunk([batch])
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
            # eval dispatches donate nothing, so retrying a dropped relay
            # connection is safe (utils/retry.py; a single transient error
            # used to abort a whole prediction member mid-pipeline); the
            # host fetch sits inside the closure because the transport
            # error can surface at materialization, not dispatch
            def _run(b=batch):
                p, _, _ = self._eval_step(self.state.params,
                                          self._device_batch(b))
                return np.asarray(p)

            probs = retry_transient(_run)
            n = meta["n_valid"]
            probs_all.append(probs[:n])
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
                def _run(b=batch):
                    _, s, t = self._eval_step(self.state.params,
                                              self._device_batch(b))
                    return np.asarray(s), np.asarray(t)

                src_emb, tgt_emb = retry_transient(_run)
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

    # -------------------------------------------------- checkpoint/resume
    def _ckpt_tree(self, epoch: int, best_f1: float, best_epoch: int,
                   best_threshold: float, stale_evals: int) -> Dict[str, Any]:
        tree = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": np.asarray(int(self.state.step), np.int64),
            "dropout_rng": np.asarray(self.state.dropout_rng),
        }
        if self.state.deltas is not None:
            # adversarial (FREE/PGD/MIX) embedding-noise state: without it a
            # resumed run restarts from zeroed deltas and diverges from the
            # uninterrupted trajectory
            tree["deltas"] = self.state.deltas
        tree["meta"] = {
            "epoch": np.asarray(epoch, np.int64),
            "best_f1": np.asarray(best_f1, np.float64),
            "best_epoch": np.asarray(best_epoch, np.int64),
            "best_threshold": np.asarray(best_threshold, np.float64),
            "stale_evals": np.asarray(stale_evals, np.int64),
        }
        return tree

    def save_checkpoint(self, manager, epoch: int, best_f1: float = 0.0,
                        best_epoch: int = -1, best_threshold: float = 0.5,
                        stale_evals: int = 0) -> None:
        """Full train-state checkpoint (params + optimizer moments + step +
        dropout rng + loop bookkeeping), replacing the reference's
        model+optimizer+scheduler+global_steps save
        (``finetune_bert.py:396-415``)."""
        manager.save(int(self.state.step),
                     self._ckpt_tree(epoch, best_f1, best_epoch,
                                     best_threshold, stale_evals))

    def restore_checkpoint(self, manager, step: Optional[int] = None
                           ) -> Dict[str, Any]:
        """Restore the full train state in place (after ``setup``); returns
        the loop bookkeeping meta (``finetune_bert.py:198-207``)."""
        assert self.state is not None, "call setup() before restore"
        like = self._ckpt_tree(0, 0.0, -1, 0.5, 0)
        tree = manager.restore(step=step, like=like)
        self.state = self.state.replace(
            params=tree["params"], opt_state=tree["opt_state"],
            step=jnp.asarray(int(tree["step"]), jnp.int32),
            dropout_rng=jnp.asarray(tree["dropout_rng"]))
        if "deltas" in tree:
            self.state = self.state.replace(deltas=tree["deltas"])
        self.state = jax.device_put(self.state, self._state_shardings)
        meta = {k: v.item() if hasattr(v, "item") else v
                for k, v in tree["meta"].items()}
        logger.info(f"[resume] restored step {int(tree['step'])} "
                    f"(epoch {meta['epoch']}, best_f1 {meta['best_f1']:.4f})")
        return meta

    def fit(self, train_ds: ArrayDataset, valid_ds: Optional[ArrayDataset] = None
            ) -> Dict[str, Any]:
        """Epoch loop with per-epoch (or per-N-steps) threshold-sweep eval,
        best-F1 tracking, optional early stopping by eval patience
        (finetune_bert.py:584-592) and full-state checkpoint/resume when
        ``config.checkpoint_dir`` is set."""
        cfg = self.config
        history = []
        best = {"best_f1": 0.0, "epoch": -1, "params": None}
        stale_evals = 0
        start_epoch = 0
        manager = None
        if cfg.checkpoint_dir:
            if self.state is None:
                first = next(train_ds.batches(cfg.train_batch_size))[0]
                self.setup(first)
            from item_alignment_tpu.engine.checkpoint import (
                CheckpointManager,
                load_params,
                save_params,
            )
            manager = CheckpointManager(cfg.checkpoint_dir,
                                        keep=cfg.keep_checkpoints)
            best_path = os.path.join(cfg.checkpoint_dir, "best_f1.msgpack")
            if cfg.resume and manager.latest_step() is not None:
                meta = self.restore_checkpoint(manager)
                start_epoch = int(meta["epoch"]) + 1
                stale_evals = int(meta["stale_evals"])
                best = {"best_f1": float(meta["best_f1"]),
                        "epoch": int(meta["best_epoch"]),
                        "threshold": float(meta["best_threshold"]),
                        "params": None}
                if best["epoch"] >= 0 and os.path.exists(best_path):
                    best["params"] = load_params(best_path,
                                                 _host_copy(self.state.params))
        for epoch in range(start_epoch, cfg.num_epochs):
            stats = self.train_epoch(train_ds, epoch, valid_ds)
            stop = False
            if valid_ds is not None:
                ev = self.evaluate(valid_ds)
                stats.update(best_f1=ev.get("best_f1"),
                             best_threshold=ev.get("best_threshold"))
                if ev.get("best_f1", 0.0) > best["best_f1"]:
                    best = {"best_f1": ev["best_f1"], "epoch": epoch,
                            "threshold": ev.get("best_threshold"),
                            "params": _host_copy(self.state.params)}
                    stale_evals = 0
                    if manager is not None:
                        save_params(best_path, best["params"])
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
                    stop = True
            history.append(stats)
            if (manager is not None
                    and (epoch + 1) % cfg.checkpoint_every_epochs == 0):
                self.save_checkpoint(
                    manager, epoch, best_f1=best["best_f1"],
                    best_epoch=best["epoch"],
                    best_threshold=best.get("threshold") or 0.5,
                    stale_evals=stale_evals)
            if stop:
                break
        best_params = best.pop("params", None)
        if best_params is not None:
            self.best_params = best_params
        return {"history": history, "best": best}
