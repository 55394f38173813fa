"""Configuration tree for the item-alignment TPU framework.

One declarative dataclass replaces the reference's two-level argparse +
``BertConfig.from_json_file`` flag-injection scheme (see reference
``finetune_text.py:195-210``).  Every knob of the reference's config matrix is
a first-class field here:

- ``interaction_type``:       one_tower | two_tower
- ``classification_method``:  cls | vec_sim
- ``similarity_measure``:     softmax | inner_product | cosine | l1 | l2
- ``loss_type``:              ce | bce | cosine | hinge | euclidean
- ``ensemble`` (multimodal):  begin | end | sum | cross_attn
- ``cls_layers`` / ``cls_pool``: which hidden states feed the head and how
  they are combined (reference ``src/models/text.py:1392,1452-1456``).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Flat model config mirroring the reference's injected BertConfig.

    Defaults correspond to chinese-roberta-wwm-ext *base* with the CCKS2022
    flag set (reference ``src/config/roberta_base.json``).
    """

    model_name: str = "roberta"

    # --- transformer encoder ---
    vocab_size: int = 21128
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 4  # vec_sim uses token_type+1 on the tgt side
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    classifier_dropout: Optional[float] = None
    num_labels: int = 2
    cate_size: Optional[int] = None  # category-embedding hook (base.py:216)

    # --- pair-classification knobs (reference flag matrix) ---
    interaction_type: str = "one_tower"       # one_tower | two_tower
    classification_method: str = "cls"        # cls | vec_sim
    similarity_measure: str = "softmax"       # softmax|inner_product|cosine|l1|l2
    loss_type: str = "ce"                     # ce|bce|cosine|hinge|euclidean
    loss_margin: float = 0.0
    cls_layers: Tuple[int, ...] = (1,)        # 1 = last layer, 2 = second-to-last…
    cls_pool: str = "cat"                     # cat | avg
    auxiliary_task: bool = False
    max_pair_indices: int = 32                # static-size aux-task pair budget

    # --- sequence layout ---
    max_seq_len: Optional[int] = 50           # title tokens
    max_seq_len_pv: Optional[int] = 205       # pv tokens

    # --- PKGM (knowledge-graph) extension ---
    num_entities: int = 0
    num_relations: int = 0
    kg_embedding_dim: int = 768
    max_pvs: int = 30
    entity_projection_bias: bool = False
    # "reference": reproduce the reference's F.normalize(dim=1) over the
    # [B,1,D] entity slice (elementwise sign-like, base.py:358) so converted
    # checkpoints match torch logits; "l2": the presumably-intended unit
    # L2 norm over the embedding dim
    kg_entity_normalize: str = "reference"

    # --- multimodal extension ---
    ensemble: Optional[str] = None            # begin | end | sum | cross_attn
    image_hidden_size: int = 3072

    # --- TextCNN ---
    filter_sizes: Tuple[int, ...] = (1, 2, 3, 5)
    num_filters: int = 128

    # --- image towers ---
    image_model_name: str = "vit_base_patch16_384"
    image_size: int = 384
    patch_size: int = 16

    # --- CoCa ---
    multimodal_depth: int = 12
    dim_head: int = 64
    coca_heads: int = 8
    ff_mult: int = 4
    caption_loss_weight: float = 1.0
    contrastive_loss_weight: float = 1.0

    # --- GCN ---
    gcn_hidden: int = 128
    gcn_layers: int = 4
    gcn_alpha: float = 0.1
    gcn_theta: float = 0.5
    gcn_feature_dim: int = 1024
    gcn_edge_chunk: Optional[int] = None      # scan the edge list in chunks
                                              # of this size (bounds the
                                              # [E, F] message buffer for
                                              # reference-scale training)
    gcn_sorted_edges: bool = False            # edge list pre-sorted by dst
                                              # (sort_edges_by_dst): lets
                                              # the scatter lower with
                                              # indices_are_sorted=True —
                                              # 8x faster TPU compile and
                                              # ~25% faster execution at
                                              # reference scale
    gcn_scan_layers: bool = False             # lax.scan over the layer
                                              # stack; measured on TPU at
                                              # reference scale it makes
                                              # the compile 5x SLOWER
                                              # (scan-of-scatter is
                                              # compiler-hostile), so the
                                              # unrolled loop is default
                                              # and the spmm custom VJP is
                                              # what keeps fwd+bwd
                                              # compilable

    # --- numerics ---
    dtype: str = "float32"                    # compute dtype: float32|bfloat16
    use_flash_attention: bool = True          # Pallas kernel on TPU when legal
    remat: bool = False                       # rematerialize encoder layers
                                              # (jax.checkpoint) to cut HBM
                                              # use during training
    remat_policy: str = "dots"                # full | dots | mlp; "dots"
                                              # saves all matmul outputs and
                                              # recomputes only cheap
                                              # elementwise/softmax work
                                              # (flash-attention-like memory
                                              # at ~no FLOP cost), "full"
                                              # recomputes the whole layer
                                              # (max memory savings), "mlp"
                                              # = "dots" minus the [B, S,
                                              # 4H] wide MLP matmul (one
                                              # extra matmul of recompute,
                                              # smaller residual set than
                                              # "dots").  NB the blessed
                                              # flagship recipe uses PLAIN
                                              # AD (no remat) at batch 40:
                                              # every measured remat policy
                                              # lost to it on a 16GB chip
                                              # (COVERAGE.md round-4/5 A/B);
                                              # remat only pays when the
                                              # batch does not otherwise fit
                                              # (e.g. pkgm bs 64 "full")
    quant: Optional[str] = None               # None | "int8": int8 MXU path
                                              # for the encoder's dense
                                              # projections (inference knob;
                                              # ops/quant.py — v5e runs int8
                                              # matmuls at 2x the bf16 rate)
    fuse_qkv: bool = False                    # one [H, 3H] q/k/v projection
                                              # matmul per layer instead of
                                              # three [H, H] (encoder.py);
                                              # param-tree identical, so
                                              # checkpoints interchange

    # ------------------------------------------------------------------
    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def pair_seq_len(self) -> int:
        """Total one-tower sequence length: 2 * per-item length."""
        return 2 * self.item_seq_len

    @property
    def item_seq_len(self) -> int:
        if self.max_seq_len is None:
            return int(self.max_seq_len_pv)
        if self.max_seq_len_pv is None:
            return int(self.max_seq_len)
        return int(self.max_seq_len) + int(self.max_seq_len_pv)

    @property
    def num_cls_features(self) -> int:
        length = 1 if self.cls_pool == "avg" else len(self.cls_layers)
        return self.hidden_size * length

    def replace(self, **kw: Any) -> "ModelConfig":
        return dataclasses.replace(self, **kw)

    # --- presets -------------------------------------------------------
    @classmethod
    def roberta_base(cls, **kw: Any) -> "ModelConfig":
        return cls(**kw)

    @classmethod
    def roberta_large(cls, **kw: Any) -> "ModelConfig":
        base = dict(
            hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
            intermediate_size=4096,
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def pkgm_base(cls, **kw: Any) -> "ModelConfig":
        base = dict(
            model_name="pkgm", num_entities=258211, num_relations=1379,
            kg_embedding_dim=768, max_seq_len=64, max_seq_len_pv=None,
            max_pvs=30,
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def pkgm_large(cls, **kw: Any) -> "ModelConfig":
        base = dict(
            model_name="pkgm", hidden_size=1024, num_hidden_layers=24,
            num_attention_heads=16, intermediate_size=4096,
            num_entities=258211, num_relations=1379, kg_embedding_dim=1024,
            max_seq_len=64, max_seq_len_pv=None, max_pvs=30,
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def roberta_image_large(cls, **kw: Any) -> "ModelConfig":
        base = dict(
            model_name="roberta_image", hidden_size=1024,
            num_hidden_layers=24, num_attention_heads=16,
            intermediate_size=4096, ensemble="begin", image_hidden_size=3072,
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def textcnn(cls, **kw: Any) -> "ModelConfig":
        base = dict(model_name="textcnn", interaction_type="two_tower")
        base.update(kw)
        return cls(**base)

    @classmethod
    def from_json(cls, path: str, **overrides: Any) -> "ModelConfig":
        """Load a reference-style JSON config, ignoring unknown keys."""
        with open(path) as f:
            raw = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in raw.items() if k in known}
        for key in ("cls_layers", "filter_sizes"):
            if isinstance(kw.get(key), str):
                kw[key] = tuple(int(i) for i in kw[key].split(","))
        kw.update(overrides)
        return cls(**kw)


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout: data (DP), fsdp (ZeRO-style), tensor (TP)."""

    data: int = -1      # -1: use all remaining devices
    fsdp: int = 1
    tensor: int = 1

    def axis_sizes(self, n_devices: int) -> Tuple[int, int, int]:
        fsdp, tensor = max(self.fsdp, 1), max(self.tensor, 1)
        data = self.data
        if data == -1:
            assert n_devices % (fsdp * tensor) == 0, (
                f"{n_devices} devices not divisible by fsdp={fsdp}*tensor={tensor}")
            data = n_devices // (fsdp * tensor)
        assert data * fsdp * tensor == n_devices, (
            f"mesh {data}x{fsdp}x{tensor} != {n_devices} devices")
        return data, fsdp, tensor


@dataclass(frozen=True)
class OptimizerConfig:
    """AdamW + linear warmup/decay, mirroring the reference's param groups
    (reference ``finetune_text.py:312-331``: no weight decay on bias and
    LayerNorm, betas (0.9, 0.98))."""

    learning_rate: float = 5e-5
    weight_decay: float = 0.01
    b1: float = 0.9
    b2: float = 0.98
    eps: float = 1e-8
    warmup_proportion: float = 0.1
    total_steps: int = 10000
    grad_accumulation_steps: int = 1
    max_grad_norm: Optional[float] = None
    # parameter freezing (reference --parameters_to_freeze,
    # finetune_text.py:257-272): substring patterns matched against the
    # '/'-joined flax param path; matching leaves receive zero updates
    freeze_patterns: Tuple[str, ...] = ()
    # single-pass AdamW update (engine/optim.py fused_adamw); False falls
    # back to optax.adamw (same math, three tree walks)
    fused: bool = True
    # storage dtype for the fused optimizer's first/second moments
    # ("float32" | "bfloat16").  The AdamW update is pure HBM traffic at
    # flagship scale; bf16 moments cut the optimizer's bytes by ~43% and
    # free 1.4GB of HBM on a 330M-param model for larger train batches.
    # Moment ARITHMETIC stays fp32 (read-upcast, write-downcast); the
    # quantization adds ~0.4% relative noise to the update direction.
    # Opt-in: the reference trains with fp32 torch Adam state.
    state_dtype: str = "float32"


@dataclass(frozen=True)
class TrainConfig:
    seed: int = 2345
    train_batch_size: int = 32
    eval_batch_size: int = 64
    num_epochs: int = 10
    log_steps: int = 100
    output_dir: str = "output"
    threshold: float = 0.5
    eval_thresholds: Tuple[float, ...] = tuple(round(0.1 * i, 1) for i in range(1, 10))
    checkpoint_every_epochs: int = 1
    keep_checkpoints: int = 20
    checkpoint_dir: Optional[str] = None     # orbax full-train-state dir;
                                             # enables save (+ resume below)
    resume: bool = False                     # restore latest full state
                                             # (params+opt+step) before fit
    eval_every_steps: Optional[int] = None   # step-based eval (finetune_bert)
    early_stopping_patience: Optional[int] = None  # evals without F1 gain
    dropout_rng_impl: str = "rbg"            # PRNG for dropout masks.  The
                                             # default threefry generator
                                             # costs ~74ms/step (31%) on
                                             # the flagship train step
                                             # (software bit-gen on the
                                             # VPU); "rbg" uses the TPU
                                             # hardware RNG.  Set
                                             # "threefry2x32" for bitwise
                                             # cross-run reproducibility
                                             # guarantees across jax
                                             # versions/shardings.
    scan_steps: int = 8                      # device-side lax.scan over K
                                             # train steps per dispatch:
                                             # a python-loop step pays the
                                             # full dispatch round trip
                                             # (~86ms through a remote-TPU
                                             # tunnel) on EVERY step; K=1
                                             # restores per-step dispatch
    mesh: MeshConfig = field(default_factory=MeshConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)

    def replace(self, **kw: Any) -> "TrainConfig":
        return dataclasses.replace(self, **kw)
