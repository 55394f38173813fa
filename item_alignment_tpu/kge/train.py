"""KGE training loop.

Equivalent of torchkge ``Trainer`` (``utils/training.py:112-218``) with the
reference's knobs (``pkgm_pretrain.py:81-135``): whole-KG pre-corruption per
epoch, margin loss, Adam + linear warmup, grad accumulation, per-epoch
``normalize_parameters``, periodic checkpoints.  The step is one jitted
gather + score + grad; bf16 is unnecessary at these sizes (gathers are
bandwidth-bound, params fp32).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from item_alignment_tpu.kge.graph import KnowledgeGraph
from item_alignment_tpu.kge.losses import kge_loss
from item_alignment_tpu.kge.models import KGEModel
from item_alignment_tpu.kge.sampling import (
    BernoulliNegativeSampler,
    UniformNegativeSampler,
)
from item_alignment_tpu.utils import logger


class KGETrainer:
    def __init__(self, model: KGEModel, kg: KnowledgeGraph,
                 loss_type: str = "margin", margin: float = 1.0,
                 n_neg: int = 3, sampling_type: str = "bernoulli",
                 learning_rate: float = 1e-4, batch_size: int = 32768,
                 n_epochs: int = 100, warmup_proportion: float = 0.1,
                 grad_accumulation_steps: int = 1, seed: int = 0,
                 save_dir: Optional[str] = None, save_epochs: int = 50,
                 mesh=None):
        """``mesh``: optional ``jax.sharding.Mesh`` — embedding tables are
        replicated (they fit one chip's HBM at reference scale) and the
        per-step triple batch is sharded over the ``data`` axis; XLA psums
        the embedding gradients (SURVEY.md §5.8)."""
        self.mesh = mesh
        self.model = model
        self.kg = kg
        self.loss_type = loss_type
        self.margin = margin
        self.n_neg = n_neg
        self.batch_size = batch_size
        self.n_epochs = n_epochs
        self.save_dir = save_dir
        self.save_epochs = save_epochs
        self.rng = jax.random.PRNGKey(seed)

        sampler_cls = (BernoulliNegativeSampler if sampling_type == "bernoulli"
                       else UniformNegativeSampler)
        self.sampler = sampler_cls(kg, n_neg=n_neg)

        steps_per_epoch = max(kg.n_facts // batch_size, 1)
        total = steps_per_epoch * n_epochs
        warmup = max(int(total * warmup_proportion), 1)
        schedule = optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup),
             optax.linear_schedule(learning_rate, 0.0, max(total - warmup, 1))],
            [warmup])
        tx = optax.adam(schedule)
        if grad_accumulation_steps > 1:
            tx = optax.MultiSteps(tx, grad_accumulation_steps)
        self.tx = tx

        init_rng, self.rng = jax.random.split(self.rng)
        self.params = model.init_params(init_rng)
        self.opt_state = tx.init(self.params)
        self._replicated = self._idx_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            data_size = int(mesh.shape.get("data", 1))
            assert batch_size % max(data_size, 1) == 0, (
                f"batch_size {batch_size} not divisible by the mesh data "
                f"axis ({data_size})")
            self._replicated = NamedSharding(mesh, PartitionSpec())
            self._idx_sharding = NamedSharding(
                mesh, PartitionSpec(None, "data"))
            self.params = jax.device_put(self.params, self._replicated)
            self.opt_state = jax.device_put(self.opt_state, self._replicated)

        model_ = model
        loss_type_ = loss_type
        margin_ = margin

        @jax.jit
        def step(params, opt_state, h, t, r, nh, nt):
            def loss_fn(p):
                pos, neg = model_.forward(p, h, t, r, nh, nt)
                return kge_loss(loss_type_, pos, neg, margin_)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._step = step

        # the KG's index arrays live on device for the whole run (they
        # never change); per epoch only the [n_steps, bs] shuffle order is
        # transferred and the negatives stay on device end-to-end
        self._dev_kg = (jnp.asarray(kg.head_idx), jnp.asarray(kg.tail_idx),
                        jnp.asarray(kg.relations))
        if mesh is not None:
            self._dev_kg = jax.device_put(self._dev_kg, self._replicated)
        n_facts_ = kg.n_facts
        n_neg_ = self.n_neg

        # device-side epoch: lax.scan over the shuffled batch indices with
        # per-step gathers; one dispatch + one host sync per EPOCH instead
        # of per step (the per-step python loop is dispatch-latency-bound,
        # especially through a remote-TPU tunnel)
        @jax.jit
        def epoch(params, opt_state, h_all, t_all, r_all, nh, nt, idx):
            def body(carry, bidx):
                p, o = carry
                neg = jnp.concatenate(
                    [bidx + i * n_facts_ for i in range(n_neg_)]
                ) % nh.shape[0]

                def loss_fn(p):
                    pos, negs = model_.forward(
                        p, h_all[bidx], t_all[bidx], r_all[bidx],
                        nh[neg], nt[neg])
                    return kge_loss(loss_type_, pos, negs, margin_)

                loss, grads = jax.value_and_grad(loss_fn)(p)
                updates, o = self.tx.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), idx)
            return params, opt_state, losses

        self._epoch = epoch
        self._normalize = jax.jit(model.normalize_parameters)

    def run(self) -> Dict[str, Any]:
        kg, bs = self.kg, self.batch_size
        history = []
        for epoch in range(self.n_epochs):
            t0 = time.time()
            ep_rng, self.rng = jax.random.split(self.rng)
            # whole-KG corruption, one vectorized op (torchkge corrupt_kg)
            nh, nt = self.sampler.corrupt_kg_device(ep_rng)
            order = np.random.RandomState(epoch).permutation(kg.n_facts)
            n_steps = max(kg.n_facts // bs, 1)
            if kg.n_facts < bs:
                # tiny KGs: one step over everything (padding by wrap)
                order = np.resize(order, bs)
            idx = order[: n_steps * bs].reshape(n_steps, bs).astype(np.int32)
            idx_dev = jnp.asarray(idx)
            if self.mesh is not None:
                # shard each step's triple batch over the data axis; the KG
                # index arrays and negatives stay replicated (gathers local)
                idx_dev = jax.device_put(idx_dev, self._idx_sharding)
                nh = jax.device_put(nh, self._replicated)
                nt = jax.device_put(nt, self._replicated)
            self.params, self.opt_state, losses = self._epoch(
                self.params, self.opt_state, *self._dev_kg, nh, nt, idx_dev)
            losses = np.asarray(losses)
            self.params = self._normalize(self.params)
            mean_loss = float(np.mean(losses)) if losses.size else float("nan")
            history.append({"epoch": epoch, "loss": mean_loss,
                            "wall_s": time.time() - t0})
            if epoch % 10 == 0 or epoch == self.n_epochs - 1:
                logger.info(f"[kge] epoch {epoch} loss {mean_loss:.4f}")
            if self.save_dir and (epoch + 1) % self.save_epochs == 0:
                self.save(os.path.join(self.save_dir,
                                       f"kge_epoch_{epoch + 1}.npz"))
        return {"history": history, "params": self.params}

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path, **{k: np.asarray(v) for k, v in self.params.items()})

    @staticmethod
    def load(path: str) -> Dict[str, jnp.ndarray]:
        data = np.load(path)
        return {k: jnp.asarray(data[k]) for k in data.files}
