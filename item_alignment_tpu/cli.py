"""Command-line interface.

One ``ia-tpu`` entry point with subcommands replacing the reference's
per-task scripts (SURVEY.md §2.6-2.7):

- ``prepare``            <- data_prepare.py
- ``finetune-text``      <- finetune_text.py (roberta / pkgm / textcnn)
- ``finetune-image``     <- finetune_image.py
- ``finetune-multimodal``<- finetune_multimodal.py
- ``finetune-graph``     <- finetune_graph.py
- ``pkgm-pretrain``      <- pkgm_pretrain.py
- ``pred-text``          <- pred_text.py (entity feature matrix for the GCN)
- ``model-soup``         <- model_soup_text.py / model_soup_multimodal.py
- ``ensemble``           <- model_ensemble.py

Flag names follow the reference argparse surface so run scripts translate
1:1 (``--model_name``, ``--interaction_type``, ``--classification_method``,
``--similarity_measure``, ``--loss_type``, ...).  Run identity is encoded in
the output dir name exactly like the reference
(``<model>-<data_version>-<interaction>-<cls>-<sim>-<loss>``,
finetune_text.py:373).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import List, Optional

import numpy as np

from item_alignment_tpu.config import (
    MeshConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)
from item_alignment_tpu.utils import logger


from item_alignment_tpu.utils.retry import (  # noqa: E402
    retry_transient as _retry_transient,
)


def _pred_text_tokenize_slice(payload):
    """Tokenize a slice of entity texts (module-level so a *spawned*
    worker — no inherited jax/TPU client state — can pickle it)."""
    vocab_path, texts, max_seq_len = payload
    from item_alignment_tpu.data.tokenization import load_text_tokenizer

    tok = load_text_tokenizer(vocab_path)
    enc = tok(texts, padding="max_length", truncation=True,
              max_length=max_seq_len)
    return (np.asarray(enc["input_ids"], np.int32),
            np.asarray(enc["attention_mask"], np.int32))


def run_dir_name(args) -> str:
    """Reference run-dir naming (finetune_text.py:373): the reference's
    ``classification_method`` string embeds the cls-layer selection (e.g.
    ``cls_1,2,3,4_cat``); our CLI splits that into --cls_layers/--cls_pool,
    so recompose it here — otherwise the cls-layers variant overwrites the
    flagship's run dir."""
    sim = args.similarity_measure or "NA"
    if getattr(args, "ensemble", None):
        # multimodal naming puts the ensemble mode in the sim slot
        # (finetune_multimodal.py:349)
        sim = args.ensemble
    cls = args.classification_method
    layers = getattr(args, "cls_layers", "1")
    if cls == "cls" and layers and layers != "1":
        cls = f"cls_{layers}_{getattr(args, 'cls_pool', 'cat')}"
    return (f"{args.model_name}-{args.data_version}-{args.interaction_type}-"
            f"{cls}-{sim}-{args.loss_type}")


def _common_train_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", default="output")
    p.add_argument("--model_name", default="roberta_base")
    p.add_argument("--data_version", default="v1")
    p.add_argument("--config_file", default=None,
                   help="reference-style JSON model config")
    p.add_argument("--pretrained_model_path", default=None)
    p.add_argument("--file_state_dict", default=None)
    p.add_argument("--interaction_type", default="one_tower",
                   choices=["one_tower", "two_tower"])
    p.add_argument("--classification_method", default="cls",
                   choices=["cls", "vec_sim"])
    p.add_argument("--similarity_measure", default=None)
    p.add_argument("--loss_type", default="ce",
                   choices=["ce", "bce", "cosine", "hinge", "euclidean"])
    p.add_argument("--loss_margin", type=float, default=0.0)
    p.add_argument("--cls_layers", default="1")
    p.add_argument("--cls_pool", default="cat", choices=["cat", "avg"])
    p.add_argument("--auxiliary_task", action="store_true")
    p.add_argument("--max_seq_len", type=int, default=50)
    p.add_argument("--max_seq_len_pv", type=int, default=205)
    p.add_argument("--max_pvs", type=int, default=30)
    p.add_argument("--train_batch_size", type=int, default=32)
    p.add_argument("--eval_batch_size", type=int, default=64)
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--warmup_proportion", type=float, default=0.1)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--total_steps", type=int, default=None,
                   help="LR-schedule horizon in optimizer updates (default: "
                        "steps_per_epoch*epochs/grad_accum).  Pin this when "
                        "an interrupted run will be resumed with a larger "
                        "--epochs so both invocations decay over the same "
                        "schedule (the computed default would give the "
                        "shorter first run a steeper decay)")
    p.add_argument("--log_steps", type=int, default=100)
    p.add_argument("--seed", type=int, default=2345)
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--eval_every_steps", type=int, default=None,
                   help="step-based mid-epoch eval cadence "
                        "(reference finetune_bert.py eval every 1000 steps)")
    p.add_argument("--scan_steps", type=int, default=8,
                   help="device-side lax.scan over K train steps per "
                        "dispatch (amortizes dispatch latency); 1 = "
                        "per-step dispatch")
    p.add_argument("--early_stopping_patience", type=int, default=None,
                   help="stop after N evals without best-F1 improvement")
    p.add_argument("--checkpoint_dir", default=None,
                   help="orbax dir for full train-state checkpoints "
                        "(params+optimizer+step); saved per epoch")
    p.add_argument("--resume", action="store_true",
                   help="restore the latest full train state from "
                        "--checkpoint_dir before training")
    p.add_argument("--parameters_to_freeze", default=None,
                   help="JSON file (or inline JSON list) of parameter-path "
                        "patterns to freeze during finetune "
                        "(finetune_text.py:257-272); matched as substrings "
                        "of the '/'-joined flax param path")
    p.add_argument("--quant", default=None, choices=["int8"],
                   help="int8 MXU path for the encoder's dense projections "
                        "(inference knob for --do_pred/--do_eval runs; v5e "
                        "runs int8 matmuls at 2x the bf16 rate). Measured "
                        "on v5e: +20%% on the ViT-384 image tower; SLOWER "
                        "than bf16 on the 510-token text cross-encoder and "
                        "two-tower mining (dynamic activation quant "
                        "overhead; see COVERAGE.md honest negatives) -- "
                        "use for image towers, skip for text")
    p.add_argument("--fuse_qkv", action="store_true",
                   help="one [H, 3H] q/k/v projection matmul per encoder "
                        "layer instead of three [H, H]; param-tree "
                        "identical, checkpoints interchange")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize encoder layers to cut HBM use")
    p.add_argument("--remat_policy", default="dots",
                   choices=["dots", "full", "mlp"],
                   help="remat policy: 'dots' keeps matmul outputs (cheap), "
                        "'full' recomputes whole layers (max memory saving), "
                        "'mlp' = dots minus the [B,S,4H] wide MLP matmul "
                        "(lightest recompute). NB: the blessed flagship "
                        "recipe trains WITHOUT --remat (plain AD, batch 40) "
                        "— every measured policy lost to it on a 16GB chip; "
                        "use remat only when the batch does not fit")
    p.add_argument("--opt_state_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="AdamW moment storage dtype: bfloat16 halves the "
                        "moment bytes (fp32 arithmetic) — frees 1.4GB on "
                        "the flagship for larger train batches")
    _distributed_flags(p)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (replaces the reference's fp16 AMP)")
    p.add_argument("--mesh", default="-1,1,1",
                   help="data,fsdp,tensor axis sizes (-1 = rest)")
    p.add_argument("--do_train", action="store_true")
    p.add_argument("--do_eval", action="store_true")
    p.add_argument("--do_pred", action="store_true")
    p.add_argument("--log_dir", default=None,
                   help="emit JSONL scalars + CSV eval results here")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of the first epoch")
    p.add_argument("--pred_with_best", action="store_true",
                   help="predict with the best-F1 epoch params (like the "
                        "reference's best-model dirs)")


def _distributed_flags(p: argparse.ArgumentParser) -> None:
    """Multi-host (DCN) flags; activate with --distributed.  On TPU pods
    the coordinator/process arguments auto-detect and may be omitted."""
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize before training "
                        "(multi-host; SURVEY.md §5.8)")
    p.add_argument("--coordinator_address", default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)


def _engine_flags(p: argparse.ArgumentParser) -> None:
    """Engine knobs for commands that don't take the full finetune flag
    surface (finetune-bert / bert-pretrain / coca-pretrain): mesh sharding,
    bf16, observability, step-cadence eval and checkpoint/resume."""
    p.add_argument("--mesh", default="-1,1,1",
                   help="data,fsdp,tensor axis sizes (-1 = all remaining)")
    _distributed_flags(p)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--log_dir", default=None)
    p.add_argument("--log_steps", type=int, default=100)
    p.add_argument("--seed", type=int, default=2345)
    p.add_argument("--eval_every_steps", type=int, default=None)
    p.add_argument("--scan_steps", type=int, default=8)
    p.add_argument("--early_stopping_patience", type=int, default=None)
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--warmup_proportion", type=float, default=0.1)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--total_steps", type=int, default=None,
                   help="LR-schedule horizon override (see finetune --help)")


def _engine_train_config(args, train_bs: int, steps_per_epoch: int
                         ) -> TrainConfig:
    from item_alignment_tpu.parallel.mesh import (
        maybe_initialize_distributed_from_args,
    )
    maybe_initialize_distributed_from_args(args)
    data, fsdp, tensor = (int(x) for x in args.mesh.split(","))
    return TrainConfig(
        seed=args.seed, train_batch_size=train_bs, eval_batch_size=train_bs,
        num_epochs=args.epochs, log_steps=args.log_steps,
        output_dir=args.output_dir, threshold=getattr(args, "threshold", 0.5),
        eval_every_steps=args.eval_every_steps,
        scan_steps=getattr(args, "scan_steps", 8),
        early_stopping_patience=args.early_stopping_patience,
        checkpoint_dir=args.checkpoint_dir, resume=args.resume,
        mesh=MeshConfig(data=data, fsdp=fsdp, tensor=tensor),
        optimizer=OptimizerConfig(
            learning_rate=args.learning_rate,
            weight_decay=args.weight_decay,
            warmup_proportion=args.warmup_proportion,
            total_steps=args.total_steps
            or max(steps_per_epoch * args.epochs
                   // max(args.gradient_accumulation_steps, 1), 1),
            grad_accumulation_steps=args.gradient_accumulation_steps,
            state_dtype=getattr(args, "opt_state_dtype", "float32")),
    )


def _model_config(args, **extra) -> ModelConfig:
    if getattr(args, "quant", None) and getattr(args, "do_train", False):
        raise SystemExit(
            "--quant int8 is an inference knob (quantize AFTER finetuning): "
            "round() has zero gradient almost everywhere, so training would "
            "silently stop learning. Drop --quant for --do_train runs.")
    kw = dict(
        model_name=args.model_name,
        interaction_type=args.interaction_type,
        classification_method=args.classification_method,
        similarity_measure=args.similarity_measure or "softmax",
        loss_type=args.loss_type, loss_margin=args.loss_margin,
        cls_layers=tuple(int(i) for i in args.cls_layers.split(",")),
        cls_pool=args.cls_pool, auxiliary_task=args.auxiliary_task,
        max_seq_len=args.max_seq_len, max_seq_len_pv=args.max_seq_len_pv,
        max_pvs=args.max_pvs, dtype="bfloat16" if args.bf16 else "float32",
        remat=args.remat, remat_policy=args.remat_policy,
        quant=getattr(args, "quant", None),
        fuse_qkv=getattr(args, "fuse_qkv", False),
    )
    kw.update(extra)
    if args.config_file:
        return ModelConfig.from_json(args.config_file, **kw)
    if "large" in args.model_name:
        base = ModelConfig.roberta_large().replace(**kw)
        return base
    return ModelConfig(**kw)


def _freeze_patterns(args) -> tuple:
    spec = getattr(args, "parameters_to_freeze", None)
    if not spec:
        return ()
    if os.path.exists(spec):
        with open(spec, encoding="utf-8") as r:
            return tuple(json.load(r))
    return tuple(json.loads(spec))


def _train_config(args, steps_per_epoch: int) -> TrainConfig:
    from item_alignment_tpu.parallel.mesh import (
        maybe_initialize_distributed_from_args,
    )
    maybe_initialize_distributed_from_args(args)
    data, fsdp, tensor = (int(x) for x in args.mesh.split(","))
    return TrainConfig(
        seed=args.seed, train_batch_size=args.train_batch_size,
        eval_batch_size=args.eval_batch_size, num_epochs=args.epochs,
        log_steps=args.log_steps, output_dir=args.output_dir,
        threshold=args.threshold,
        eval_every_steps=args.eval_every_steps,
        scan_steps=getattr(args, "scan_steps", 8),
        early_stopping_patience=args.early_stopping_patience,
        checkpoint_dir=args.checkpoint_dir, resume=args.resume,
        mesh=MeshConfig(data=data, fsdp=fsdp, tensor=tensor),
        optimizer=OptimizerConfig(
            learning_rate=args.learning_rate,
            weight_decay=args.weight_decay,
            warmup_proportion=args.warmup_proportion,
            # MultiSteps only advances the schedule once per k mini-batches,
            # so the schedule length counts OPTIMIZER updates
            # (finetune_text.py:325-329 divides the same way)
            total_steps=args.total_steps
            or max(steps_per_epoch * args.epochs
                   // max(args.gradient_accumulation_steps, 1), 1),
            grad_accumulation_steps=args.gradient_accumulation_steps,
            freeze_patterns=_freeze_patterns(args),
            state_dtype=getattr(args, "opt_state_dtype", "float32")),
    )


def _dump_hyperparameters(args, out_dir: str) -> None:
    """hyperparamter.txt dump (finetune_text.py:380-383)."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "hyperparamter.txt"), "w") as w:
        for k, v in sorted(vars(args).items()):
            w.write(f"{k}={v}\n")


# ------------------------------------------------------------- commands
def cmd_prepare(argv: List[str]) -> int:
    """Offline preprocessing with the reference's dispatch surface
    (data_prepare.py:1508-1524): ``--only_image --object_detection`` crops,
    ``--only_image`` writes image-pair shards, ``--with_image`` dumps/loads
    ``image_embedding.json`` and threads it into the finetune TSVs, plain
    runs produce the text/KG artifacts."""
    p = argparse.ArgumentParser(prog="ia-tpu prepare")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--valid_proportion", type=float, default=0.1)
    p.add_argument("--num_train_augment", type=int, default=0)
    p.add_argument("--num_neg", type=int, default=5)
    p.add_argument("--prev_valid", default=None)
    p.add_argument("--seed", type=int, default=0)
    # image pipeline (reference data_prepare.py argparse surface)
    p.add_argument("--with_image", action="store_true")
    p.add_argument("--only_image", action="store_true")
    p.add_argument("--object_detection", action="store_true")
    p.add_argument("--dtypes", default="train,valid")
    p.add_argument("--image_size", type=int, default=288)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--cv_model_name", default="eca_nfnet_l0")
    p.add_argument("--pretrained_model_path", default=None,
                   help="torch-saved timm state_dict for the embedding dump")
    p.add_argument("--finetuned", action="store_true",
                   help="encode with a finetuned two-tower (--file_state_dict)")
    p.add_argument("--file_state_dict", default=None,
                   help="finetune-image msgpack (with --finetuned)")
    p.add_argument("--boxes_file", default=None,
                   help="precomputed detector boxes jsonl for "
                        "--object_detection (item_id -> [x1,y1,x2,y2,cls,conf])")
    p.add_argument("--min_crop_ratio", type=float, default=0.1)
    p.add_argument("--detector", default="saliency",
                   choices=["saliency", "none"],
                   help="box source when no --boxes_file/--yolo_weights: "
                        "'saliency' = the offline background-segmentation "
                        "fallback detector (data/images.py "
                        "propose_box_saliency, standing in for the "
                        "reference's torch.hub YOLOv5); 'none' copies "
                        "images uncropped")
    p.add_argument("--yolo_weights", default=None,
                   help="locally exported YOLOv5 TorchScript file: runs the "
                        "REAL detector for --object_detection on CPU torch "
                        "(data/yolo.py; the reference's torch.hub download, "
                        "data_prepare.py:1450-1505, needs network access)")
    p.add_argument("--yolo_imgsz", type=int, default=640)
    p.add_argument("--yolo_conf_thres", type=float, default=0.25)
    p.add_argument("--images_dir", default=None,
                   help="defaults to <data_dir>/item_images[_cropped]")
    p.add_argument("--shard_size", type=int, default=1024)
    args = p.parse_args(argv)

    if args.only_image:
        if args.object_detection:
            return _prepare_object_detection(args)
        return _prepare_image_shards(args)
    from item_alignment_tpu.data.prepare import prepare_all

    img_emb = _load_image_embedding(args) if args.with_image else None
    files = prepare_all(args.data_dir, args.output_dir,
                        valid_proportion=args.valid_proportion,
                        seed=args.seed,
                        num_train_augment=args.num_train_augment,
                        num_neg=args.num_neg, prev_valid=args.prev_valid,
                        img_emb=img_emb)
    print(json.dumps(files))
    return 0


def _iter_item_info(path: str):
    with open(path, encoding="utf-8") as r:
        for line in r:
            if line.strip():
                yield json.loads(line)


def _load_image_embedding(args):
    """``load_image_embedding`` (data_prepare.py:275-364): reuse an existing
    ``image_embedding.json`` or dump one through a pretrained/finetuned
    image tower. Images live at ``<data_dir>/item_images_cropped/<id>.jpg``
    like the reference; missing images get zero embeddings."""
    import jax

    out_path = os.path.join(args.output_dir, "image_embedding.json")
    if os.path.isfile(out_path):
        from item_alignment_tpu.data.native_loader import read_embedding_spans
        spans = read_embedding_spans(out_path)
        if spans is not None:
            # native offset scan: ids + raw array text sliced straight out
            # of the file — no json.load (minutes + GBs of boxed floats at
            # reference scale), no reformatting
            emb = dict(spans)
        else:
            from item_alignment_tpu.data.images import (
                embedding_texts_from_mapping)
            with open(out_path, encoding="utf-8") as r:
                emb = embedding_texts_from_mapping(json.load(r))
        logger.info(f"loaded image embeddings for {len(emb)} items")
        return emb

    from item_alignment_tpu.data.images import dump_image_embeddings
    from item_alignment_tpu.models.image import backbone_for

    cfg = ModelConfig(model_name=args.cv_model_name,
                      image_model_name=args.cv_model_name,
                      image_size=args.image_size)
    model = backbone_for(args.cv_model_name, cfg)
    dummy = np.zeros((1, args.image_size, args.image_size, 3), np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy)
    if args.finetuned:
        # encode through our finetuned two-tower backbone
        # (reference --finetuned branch, data_prepare.py:283-289)
        if not args.file_state_dict:
            raise SystemExit("--finetuned needs --file_state_dict "
                             "(finetune-image msgpack)")
        from flax import serialization

        from item_alignment_tpu.utils.timm_import import _overlay_exact
        with open(args.file_state_dict, "rb") as f:
            tree = serialization.msgpack_restore(f.read())
        tree = tree.get("params", tree)
        backbone_keys = [k for k in tree
                         if k.split("_")[0] in ("NFNet", "ResNetV2", "ViT")]
        src = tree[backbone_keys[0]] if backbone_keys else tree
        params = jax.tree_util.tree_map(np.asarray, params)
        _overlay_exact(params["params"], src)
    elif args.pretrained_model_path:
        from item_alignment_tpu.utils.hf_import import load_torch_state_dict
        from item_alignment_tpu.utils.timm_import import load_timm_backbone
        sd = load_torch_state_dict(
            _resolve_checkpoint_file(args.pretrained_model_path))
        params = load_timm_backbone(params, sd, args.cv_model_name)
    else:
        # random weights would silently poison every downstream TSV
        raise SystemExit("--with_image needs --pretrained_model_path (timm "
                         "state_dict) or --finetuned --file_state_dict")

    apply_fn = jax.jit(model.apply)

    def encode(imgs: np.ndarray) -> np.ndarray:
        out = apply_fn(params, imgs.astype(np.float32))
        if isinstance(out, tuple):  # ViT returns (cls, tokens)
            out = out[0]
        return np.asarray(out)

    info = os.path.join(args.data_dir, "item_info.jsonl")
    images_dir = args.images_dir or os.path.join(args.data_dir,
                                                 "item_images_cropped")
    ids, paths = [], []
    for d in _iter_item_info(info):
        ids.append(d["item_id"])
        paths.append(os.path.join(images_dir, f"{d['item_id']}.jpg"))
    feat_dim = int(encode(np.zeros(
        (1, args.image_size, args.image_size, 3), np.float32)).shape[-1])
    emb = dump_image_embeddings(ids, paths, encode, out_path,
                                image_size=args.image_size,
                                batch_size=args.batch_size,
                                missing_dim=feat_dim)
    logger.info(f"dumped {len(emb)} image embeddings (dim {feat_dim})")
    return emb


def _prepare_image_shards(args) -> int:
    """``image_data`` (data_prepare.py:1350-1448): pair files -> transformed
    image pairs -> npz shards (our tensorpack-LMDB replacement)."""
    from item_alignment_tpu.data.images import (
        eval_transform,
        load_image,
        train_transform,
        write_image_shards,
    )

    id2name = {d["item_id"]: d.get("item_image_name", f"{d['item_id']}.jpg")
               for d in _iter_item_info(
                   os.path.join(args.data_dir, "item_info.jsonl"))}
    images_dir = args.images_dir or os.path.join(args.data_dir, "item_images")
    rng = np.random.RandomState(args.seed)
    written = {}
    for dtype in args.dtypes.split(","):
        pair_file = {"train": "item_train_pair.jsonl",
                     "valid": "item_valid_pair.jsonl",
                     "test": "item_test_pair.jsonl"}[dtype]
        path = os.path.join(args.data_dir, pair_file)
        if not os.path.exists(path):
            logger.warning(f"skipping {dtype}: no {pair_file}")
            continue

        def gen():
            skipped = 0
            with open(path, encoding="utf-8") as r:
                for line in r:
                    d = json.loads(line)
                    sid, tid = d["src_item_id"], d["tgt_item_id"]
                    label = int(d.get("item_label", 0))
                    img1 = load_image(os.path.join(images_dir,
                                                   id2name.get(sid, "")))
                    img2 = load_image(os.path.join(images_dir,
                                                   id2name.get(tid, "")))
                    if img1 is None or img2 is None:
                        skipped += 1  # broken images dropped (data.py:859)
                        continue
                    # shards store post-transform uint8: 4x smaller than
                    # normalized fp32 (and zlib-compressible, so the
                    # savez_compressed branch kicks in), 4x less
                    # host->device traffic; the towers normalize uint8
                    # inputs on-device with bit-identical math
                    # (models/image.py maybe_normalize_uint8)
                    if dtype == "train":
                        t1 = train_transform(img1, args.image_size, rng,
                                             normalized=False)
                        t2 = train_transform(img2, args.image_size, rng,
                                             normalized=False)
                    else:
                        t1 = eval_transform(img1, args.image_size,
                                            normalized=False)
                        t2 = eval_transform(img2, args.image_size,
                                            normalized=False)
                    yield (f"{sid}|{tid}", t1, t2, label)
            if skipped:
                logger.warning(f"[{dtype}] skipped {skipped} broken pairs")

        written[dtype] = write_image_shards(
            gen(), args.output_dir, shard_size=args.shard_size,
            prefix=f"{dtype}_feat", transformed=True)
    print(json.dumps(written))
    return 0


def _prepare_object_detection(args) -> int:
    """Detection-guided crop with precomputed boxes (the offline substitute
    for the reference's torch.hub YOLOv5 pass, data_prepare.py:1450-1505)."""
    from item_alignment_tpu.data.images import crop_images_with_boxes

    boxes = {}
    detector = None
    if args.boxes_file:
        with open(args.boxes_file, encoding="utf-8") as r:
            text = r.read()
        try:  # one json dict {item_id: [...boxes...]}
            boxes = json.loads(text)
        except json.JSONDecodeError:  # jsonl rows {"item_id":..., "boxes":...}
            for line in text.splitlines():
                if line.strip():
                    d = json.loads(line)
                    boxes[d["item_id"]] = d["boxes"]
    elif args.yolo_weights:
        from item_alignment_tpu.data.yolo import YoloTorchscriptDetector
        detector = YoloTorchscriptDetector(
            args.yolo_weights, imgsz=args.yolo_imgsz,
            conf_thres=args.yolo_conf_thres)
        logger.info("YOLOv5 TorchScript detector: %s", args.yolo_weights)
    elif args.detector == "saliency":
        from item_alignment_tpu.data.images import propose_box_saliency
        detector = propose_box_saliency
        logger.info("no --boxes_file: background-saliency fallback detector")
    else:
        logger.warning("no --boxes_file: every image is copied uncropped")
    images_dir = args.images_dir or os.path.join(args.data_dir, "item_images")
    out_dir = os.path.join(args.output_dir, "item_images_cropped")
    stats = crop_images_with_boxes(
        os.path.join(args.data_dir, "item_info.jsonl"), images_dir, out_dir,
        boxes, args.min_crop_ratio, detector=detector)
    print(json.dumps({"output_dir": out_dir, **stats}))
    return 0


def _load_tsv_rows(args, split: str):
    from item_alignment_tpu.data.prepare import read_finetune_tsv

    path = os.path.join(args.data_dir, split)
    if not os.path.exists(path):
        return None
    return read_finetune_tsv(path)


def cmd_finetune_text(argv: List[str]) -> int:
    p = argparse.ArgumentParser(prog="ia-tpu finetune-text")
    _common_train_flags(p)
    p.add_argument("--vocab_path", required=True,
                   help="dir containing vocab.txt")
    p.add_argument("--train_file", default="finetune_train_train.tsv")
    p.add_argument("--valid_file", default="finetune_train_valid.tsv")
    p.add_argument("--test_file", default="finetune_test.tsv",
                   help="--do_pred predicts on this when present "
                        "(submission flow), else on --valid_file")
    p.add_argument("--entity2id", default=None)
    p.add_argument("--relation2id", default=None)
    args = p.parse_args(argv)

    from item_alignment_tpu.data.tokenization import (
        load_kg_tokenizers,
        load_text_tokenizer,
        rows_to_one_tower_dataset,
        rows_to_pkgm_dataset,
        rows_to_two_tower_dataset,
    )
    from item_alignment_tpu.engine.train import Trainer
    from item_alignment_tpu.models import build_model

    tok = load_text_tokenizer(args.vocab_path)
    train_rows = _load_tsv_rows(args, args.train_file)
    valid_rows = _load_tsv_rows(args, args.valid_file)

    extra = {}
    if "pkgm" in args.model_name:
        assert args.entity2id and args.relation2id, "pkgm needs KG id maps"
        kg_ent, kg_rel = load_kg_tokenizers(args.entity2id, args.relation2id)
        extra = dict(num_entities=max(kg_ent.values()) + 1,
                     num_relations=max(kg_rel.values()) + 1,
                     max_seq_len_pv=None)
    cfg = _model_config(args, vocab_size=len(tok), **extra)

    def build_ds(rows):
        if rows is None:
            return None
        if "pkgm" in args.model_name:
            if args.interaction_type == "two_tower":
                from item_alignment_tpu.data.tokenization import (
                    rows_to_pkgm_two_tower_dataset,
                )
                return rows_to_pkgm_two_tower_dataset(
                    rows, tok, kg_ent, kg_rel, cfg.max_seq_len, cfg.max_pvs)
            return rows_to_pkgm_dataset(rows, tok, kg_ent, kg_rel,
                                        cfg.max_seq_len, cfg.max_pvs,
                                        cfg.classification_method)
        if args.interaction_type == "two_tower" or "textcnn" in args.model_name:
            return rows_to_two_tower_dataset(rows, tok, cfg.max_seq_len,
                                             cfg.max_seq_len_pv)
        return rows_to_one_tower_dataset(rows, tok, cfg.max_seq_len,
                                         cfg.max_seq_len_pv,
                                         cfg.classification_method,
                                         cfg.auxiliary_task,
                                         cfg.max_pair_indices)

    train_ds = build_ds(train_rows)
    valid_ds = build_ds(valid_rows)
    out_dir = os.path.join(args.output_dir, run_dir_name(args))
    _dump_hyperparameters(args, out_dir)

    steps = train_ds.num_batches(args.train_batch_size) if train_ds else 1
    trainer = Trainer(build_model(cfg), _train_config(args, steps),
                      log_dir=args.log_dir)

    if args.do_train:
        first = next(train_ds.batches(args.train_batch_size))[0]
        trainer.setup(first)
        if args.pretrained_model_path:
            _load_pretrained(trainer, cfg, args)
        from item_alignment_tpu.engine.observability import profile_trace
        with profile_trace(args.profile_dir):
            result = trainer.fit(train_ds, valid_ds)
        _save_epoch_params(trainer, out_dir, args.epochs)
        from item_alignment_tpu.engine.checkpoint import save_params
        best = trainer.best_params if trainer.best_params is not None \
            else trainer.state.params
        save_params(os.path.join(out_dir, "best_f1.msgpack"), best)
        print(json.dumps({"best": result["best"]}))
    if args.do_eval and valid_ds is not None and len(valid_ds) > 0:
        if trainer.state is None:
            trainer.setup(next(valid_ds.batches(args.eval_batch_size))[0])
            _maybe_restore(trainer, args)
        ev = trainer.evaluate(valid_ds)
        print(json.dumps({"sweep": ev.get("sweep", []),
                          "best_f1": ev.get("best_f1"),
                          "best_threshold": ev.get("best_threshold")}))
    if args.do_pred:
        # reference submission flow: predict on the TEST pairs when the
        # prepared test TSV exists (finetune_text.py --do_pred), otherwise
        # on the validation split
        test_rows = _load_tsv_rows(args, args.test_file)
        pred_ds = build_ds(test_rows) if test_rows else valid_ds
        if pred_ds is not None and len(pred_ds) > 0:
            if trainer.state is None:
                trainer.setup(next(pred_ds.batches(args.eval_batch_size))[0])
                _maybe_restore(trainer, args)
            if args.pred_with_best and trainer.best_params is not None:
                from item_alignment_tpu.parallel.sharding import shard_params
                trainer.state = trainer.state.replace(
                    params=shard_params(trainer.best_params, trainer.mesh))
            path = os.path.join(
                out_dir, f"deepAI_result_threshold={args.threshold}.jsonl")
            trainer.predict_jsonl(pred_ds, path, args.threshold)
            print(json.dumps({"prediction_file": path,
                              "prediction_split": "test" if test_rows
                              else "valid"}))
    return 0


def _load_pretrained(trainer, cfg, args) -> None:
    from item_alignment_tpu.utils.hf_import import (
        convert_pkgm_state_dicts,
        import_hf_roberta,
        load_torch_state_dict,
    )
    import jax

    rob = os.path.join(args.pretrained_model_path, "pytorch_model.bin")
    kg = os.path.join(args.pretrained_model_path, "pkgm_model.bin")
    if not os.path.exists(rob):
        logger.warning(f"no pytorch_model.bin under {args.pretrained_model_path}")
        return
    sd = load_torch_state_dict(rob)
    params = jax.tree_util.tree_map(np.asarray,
                                    {"params": trainer.state.params})
    if "pkgm" in args.model_name and os.path.exists(kg):
        tree = convert_pkgm_state_dicts(sd, load_torch_state_dict(kg),
                                        cfg.type_vocab_size,
                                        cfg.max_position_embeddings)
        from item_alignment_tpu.utils.hf_import import _overlay
        for k in tree:
            _overlay(params["params"]["roberta"][k], tree[k])
    else:
        params = import_hf_roberta(params, sd, cfg)
    from item_alignment_tpu.parallel.sharding import shard_params
    trainer.state = trainer.state.replace(
        params=shard_params(params["params"], trainer.mesh))
    logger.info("loaded pretrained encoder weights")


def _resolve_checkpoint_file(path: str) -> str:
    if os.path.isdir(path):
        for cand in ("pytorch_model.bin", "model.pth", "model.bin",
                     "checkpoint.pth"):
            p2 = os.path.join(path, cand)
            if os.path.exists(p2):
                return p2
    return path


def _load_timm_pretrained(trainer, args) -> None:
    """timm backbone weights for the image towers. The reference builds
    ``timm.create_model(name, pretrained=True)`` (finetune_image.py:191-218);
    offline here, ``--pretrained_model_path`` points to the torch-saved
    timm state_dict (file or HF-style dir)."""
    from item_alignment_tpu.parallel.sharding import shard_params
    from item_alignment_tpu.utils.hf_import import load_torch_state_dict
    from item_alignment_tpu.utils.timm_import import load_timm_backbone

    path = _resolve_checkpoint_file(args.pretrained_model_path)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"--pretrained_model_path {args.pretrained_model_path}: no "
            "checkpoint found (expected a torch state_dict of the timm "
            f"model for {args.model_name})")
    sd = load_torch_state_dict(path)
    tree = load_timm_backbone(trainer.state.params, sd, args.model_name)
    trainer.state = trainer.state.replace(
        params=shard_params(tree, trainer.mesh))
    logger.info(f"loaded timm pretrained backbone from {path}")


def _load_coca_pretrained(trainer, args) -> None:
    """Overlay a ``coca-pretrain`` msgpack checkpoint's shared subtrees
    (``coca``, ``multimodal``) onto the CoCaForItemAlignment params
    (the reference loads the CoCa pretrain .pt with strict=False,
    finetune_multimodal.py)."""
    import jax

    from flax import serialization

    from item_alignment_tpu.parallel.sharding import shard_params

    path = _resolve_checkpoint_file(args.pretrained_model_path)
    if os.path.isdir(args.pretrained_model_path):
        cand = os.path.join(args.pretrained_model_path,
                            "coca_pretrain.msgpack")
        if os.path.exists(cand):
            path = cand
    with open(path, "rb") as f:
        pre = serialization.msgpack_restore(f.read())
    pre = pre.get("params", pre)
    params = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    loaded = []
    for key in ("coca", "multimodal"):
        if key in pre and key in params:
            from item_alignment_tpu.utils.hf_import import _overlay
            _overlay(params[key], pre[key])
            loaded.append(key)
    assert loaded, f"no shared subtrees between {path} and the model params"
    trainer.state = trainer.state.replace(
        params=shard_params(params, trainer.mesh))
    logger.info(f"loaded coca pretrain subtrees {loaded} from {path}")


def _save_epoch_params(trainer, out_dir: str, epoch: int,
                       kind: str = "text") -> None:
    """``<kind>_finetune_epoch-N.msgpack`` (reference finetune_text.py:587 /
    finetune_image.py:390 / finetune_multimodal.py:568 naming)."""
    from item_alignment_tpu.engine.checkpoint import save_params

    path = os.path.join(out_dir, f"{kind}_finetune_epoch-{epoch}.msgpack")
    save_params(path, trainer.state.params)
    logger.info(f"saved {path}")


def _maybe_restore(trainer, args) -> None:
    if not args.file_state_dict:
        return
    if not os.path.exists(args.file_state_dict):
        # an explicitly requested state dict that does not exist must fail
        # loudly: silently continuing would predict with random weights and
        # feed garbage scores into the ensemble/submission
        raise FileNotFoundError(
            f"--file_state_dict {args.file_state_dict} does not exist")
    from item_alignment_tpu.engine.checkpoint import load_params

    params = load_params(args.file_state_dict, trainer.state.params)
    from item_alignment_tpu.parallel.sharding import shard_params
    trainer.state = trainer.state.replace(
        params=shard_params(params, trainer.mesh))


def _kge_mesh(args):
    if not getattr(args, "mesh", None):
        return None
    from item_alignment_tpu.config import MeshConfig
    from item_alignment_tpu.parallel.mesh import create_mesh
    data, fsdp, tensor = (int(x) for x in args.mesh.split(","))
    return create_mesh(MeshConfig(data=data, fsdp=fsdp, tensor=tensor))


def cmd_pkgm_pretrain(argv: List[str]) -> int:
    p = argparse.ArgumentParser(prog="ia-tpu pkgm-pretrain")
    p.add_argument("--data_dir", required=True,
                   help="dir with entity2id/relation2id/train2id.txt")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--model_name", default="pkgm",
                   help="kge model: transe|pkgm|transh|...")
    p.add_argument("--embedding_dim", type=int, default=768)
    p.add_argument("--batch_size", type=int, default=32768)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--margin", type=float, default=1.0)
    p.add_argument("--n_neg", type=int, default=3)
    p.add_argument("--sampling_type", default="bernoulli")
    p.add_argument("--do_eval", action="store_true")
    p.add_argument("--save_epochs", type=int, default=50)
    p.add_argument("--mesh", default=None,
                   help="data,fsdp,tensor axis sizes: shard the triple "
                        "batches over the data axis (e.g. '-1,1,1')")
    args = p.parse_args(argv)

    from item_alignment_tpu.kge import (
        KGETrainer,
        LinkPredictionEvaluator,
        load_ccks,
        make_kge_model,
    )

    kgs = load_ccks(args.data_dir, do_eval=args.do_eval)
    kg_train = kgs[0]
    model = make_kge_model(args.model_name, kg_train.n_ent, kg_train.n_rel,
                           args.embedding_dim)
    trainer = KGETrainer(model, kg_train, margin=args.margin,
                         n_neg=args.n_neg, sampling_type=args.sampling_type,
                         learning_rate=args.learning_rate,
                         batch_size=args.batch_size, n_epochs=args.epochs,
                         save_dir=args.output_dir,
                         save_epochs=args.save_epochs,
                         mesh=_kge_mesh(args))
    result = trainer.run()
    trainer.save(os.path.join(args.output_dir, "kge_final.npz"))
    out = {"final_loss": result["history"][-1]["loss"]}
    if args.do_eval and len(kgs) > 1:
        ev = LinkPredictionEvaluator(model, result["params"], kgs[1],
                                     kg_filter=kgs).evaluate()
        out.update(hit10=ev.hit_at_k(10)[1], mrr=ev.mrr()[1])
    print(json.dumps(out))
    return 0


def cmd_ensemble(argv: List[str]) -> int:
    p = argparse.ArgumentParser(prog="ia-tpu ensemble")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--ensemble_strategy", required=True,
                   choices=["threshold", "f1"])
    p.add_argument("--models", required=True,
                   help="JSON list of [model_dir, threshold, f1] triples")
    p.add_argument("--models_unseen", default=None,
                   help="JSON triples for unseen-category pairs")
    p.add_argument("--item_info", default=None,
                   help="item_info.jsonl for the category split")
    p.add_argument("--input_file", default="deepAI_result_threshold=0.4.jsonl")
    p.add_argument("--output_dir", default=None)
    args = p.parse_args(argv)

    from item_alignment_tpu.aggregate.ensemble import (
        ensemble_predictions,
        make_unseen_checker,
        read_prediction_file,
        write_prediction_file,
    )

    def load(spec_json):
        out = []
        for model_dir, thr, f1 in json.loads(spec_json):
            base = os.path.join(args.data_dir, "output", model_dir)
            path = os.path.join(base, args.input_file)
            if not os.path.exists(path):
                # members predicted at a different --threshold write
                # differently named files; accept ONLY the file matching
                # this member's own spec threshold — an arbitrary leftover
                # (even an unambiguous one) could be a stale prediction
                # from an earlier run
                cand = os.path.join(
                    base, f"deepAI_result_threshold={float(thr)}.jsonl")
                if os.path.exists(cand):
                    path = cand
                else:
                    raise FileNotFoundError(
                        f"neither {path} nor {cand} exists in {base}")
            out.append((read_prediction_file(path), float(thr), float(f1)))
        return out

    preds = load(args.models)
    unseen_preds = load(args.models_unseen) if args.models_unseen else None
    checker = None
    if unseen_preds is not None:
        assert args.item_info, "--item_info required for the category split"
        id_dict = {}
        with open(args.item_info, encoding="utf-8") as r:
            for line in r:
                d = json.loads(line)
                id_dict[d["item_id"]] = d
        checker = make_unseen_checker(id_dict)
    fused = ensemble_predictions(preds, args.ensemble_strategy,
                                 unseen_preds, checker)
    out_dir = args.output_dir or os.path.join(args.data_dir, "output",
                                              "ensemble")
    path = write_prediction_file(fused, os.path.join(out_dir,
                                                     "deepAI_result.jsonl"))
    print(json.dumps({"output": path, "pairs": len(fused)}))
    return 0


def cmd_mine(argv: List[str]) -> int:
    """Embedding-cache mining/serving (beyond the reference): encode each
    unique item ONCE with a finetuned two-tower text model, then score a
    candidate-pair list against the cache (``engine/inference.py``; the
    SURVEY §6 north-star workload).  The reference's two-tower models
    re-encode both items for every pair (``src/models/text.py:1313``),
    which caps mining throughput at the encoder rate; the cache path
    scores ~100x more pairs per second once items are encoded.

    ``--cache_quant int8`` stores the cache as int8 rows (half HBM/gather
    bandwidth); ``--quant int8`` also runs the encoder's dense projections
    on the int8 MXU."""
    p = argparse.ArgumentParser(prog="ia-tpu mine")
    p.add_argument("--item_info", required=True,
                   help="raw item_info.jsonl (item_id/title/item_pvs)")
    p.add_argument("--pairs", required=True,
                   help="candidate pairs jsonl (src_item_id/tgt_item_id)")
    p.add_argument("--output", required=True)
    p.add_argument("--vocab_path", required=True)
    p.add_argument("--config_file", default=None)
    p.add_argument("--model_name", default="roberta_large")
    p.add_argument("--file_state_dict", default=None,
                   help="finetune-text two_tower params msgpack")
    p.add_argument("--allow_random_weights", action="store_true")
    p.add_argument("--max_seq_len", type=int, default=50)
    p.add_argument("--max_seq_len_pv", type=int, default=205)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--quant", default=None, choices=["int8"])
    p.add_argument("--cache_quant", default=None, choices=["int8"])
    p.add_argument("--num_workers", type=int, default=8)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from item_alignment_tpu.data.prepare import (
        load_item_info,
        order_pvs_single,
        parse_pvs,
        segment_title,
    )
    from item_alignment_tpu.data.tokenization import (
        build_item_text,
        load_text_tokenizer,
    )
    from item_alignment_tpu.engine.inference import TwoTowerInference
    from item_alignment_tpu.models.heads import TwoTowerClassificationHead
    from item_alignment_tpu.models.text import RobertaBackbone, RobertaTwoTower

    if not (args.file_state_dict or args.allow_random_weights):
        raise SystemExit("mine needs --file_state_dict (trained two-tower "
                         "params); pass --allow_random_weights to override")

    tok = load_text_tokenizer(args.vocab_path)
    id_dict, _, relation_count = load_item_info(args.item_info)

    pairs = []
    with open(args.pairs, encoding="utf-8") as r:
        for line in r:
            if line.strip():
                d = json.loads(line)
                pairs.append((d["src_item_id"], d["tgt_item_id"]))
    item_ids = sorted({i for pr in pairs for i in pr})
    missing = [i for i in item_ids if i not in id_dict]
    if missing:
        raise SystemExit(f"{len(missing)} pair items missing from "
                         f"--item_info (first: {missing[:3]})")

    # item text in the TRAINING layout: jieba-cut title + frequency-ordered
    # pvs (build_finetune_pairs does the same per pair side)
    def item_text(iid: str) -> str:
        it = id_dict[iid]
        pvs = order_pvs_single(it.get("pvs") or parse_pvs(it),
                               relation_count, it.get("cate_name", ""))
        return build_item_text(segment_title(it.get("title", "")), pvs,
                               tok.sep_token)

    texts = [item_text(i) for i in item_ids]
    S = args.max_seq_len + args.max_seq_len_pv
    if args.num_workers > 1 and len(texts) >= 4 * args.num_workers:
        import multiprocessing as mp

        k = args.num_workers
        sl = (len(texts) + k - 1) // k
        payloads = [(args.vocab_path, texts[i: i + sl], S)
                    for i in range(0, len(texts), sl)]
        with mp.get_context("spawn").Pool(k) as pool:
            parts = pool.map(_pred_text_tokenize_slice, payloads)
        ids_all = np.concatenate([p[0] for p in parts])
        mask_all = np.concatenate([p[1] for p in parts])
    else:
        enc = tok(texts, padding="max_length", truncation=True, max_length=S)
        ids_all = np.asarray(enc["input_ids"], np.int32)
        mask_all = np.asarray(enc["attention_mask"], np.int32)

    kw = dict(vocab_size=len(tok), interaction_type="two_tower",
              max_seq_len=args.max_seq_len, max_seq_len_pv=args.max_seq_len_pv,
              hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
              quant=args.quant)
    if args.config_file:
        cfg = ModelConfig.from_json(args.config_file, **kw)
    elif "large" in args.model_name:
        cfg = ModelConfig.roberta_large().replace(**kw)
    else:
        cfg = ModelConfig(**kw)

    model = RobertaTwoTower(cfg)
    B = min(args.batch_size, len(item_ids))
    ids0 = jnp.ones((B, S), jnp.int32)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                 ids0, ids0, ids0 * 0 + 1, ids0 * 0 + 1)
    if args.file_state_dict:
        if not os.path.exists(args.file_state_dict):
            raise FileNotFoundError(
                f"--file_state_dict {args.file_state_dict} does not exist")
        from item_alignment_tpu.engine.checkpoint import load_params

        # finetune-text serializes the INNER variables["params"] tree
        # (Trainer._init_params), not the full init tree
        params = {"params": load_params(args.file_state_dict,
                                        params["params"])}

    backbone = RobertaBackbone(cfg)
    head = TwoTowerClassificationHead(dropout_rate=0.0,
                                      num_labels=cfg.num_labels)

    def encode_fn(p, batch):
        states = backbone.apply({"params": p["params"]["roberta"]},
                                batch["input_ids"], batch["attention_mask"])
        return states[-1][:, 0]

    def head_fn(p, se, te):
        _, _, _, full = head.apply({"params": p["params"]["classifier"]},
                                   se, te, True)
        return full[:, 1]

    inf = TwoTowerInference(params, encode_fn, head_fn, batch_size=256,
                            cache_quant=args.cache_quant)

    def batches():
        n = len(item_ids)
        for s in range(0, n, B):
            ids_b = ids_all[s: s + B]
            mask_b = mask_all[s: s + B]
            if len(ids_b) < B:  # pad tail to the compiled shape
                pad = B - len(ids_b)
                ids_b = np.pad(ids_b, ((0, pad), (0, 0)))
                mask_b = np.pad(mask_b, ((0, pad), (0, 0)))
            yield {"input_ids": jnp.asarray(ids_b),
                   "attention_mask": jnp.asarray(mask_b)}

    t0 = time.time()
    inf.build_cache(item_ids, batches())
    t_encode = time.time() - t0
    t0 = time.time()
    probs = inf.score_pairs_by_id(pairs)
    t_score = time.time() - t0

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "w", encoding="utf-8") as w:
        for (src, tgt), prob in zip(pairs, probs):
            w.write(json.dumps({
                "src_item_id": src, "src_item_emb": "[0]",
                "tgt_item_id": tgt, "tgt_item_emb": f"[{float(prob)}]",
                "threshold": args.threshold}) + "\n")
    print(json.dumps({
        "output": args.output, "items": len(item_ids), "pairs": len(pairs),
        "encode_s": round(t_encode, 2), "score_s": round(t_score, 2),
        "pairs_per_sec": round(len(pairs) / max(t_encode + t_score, 1e-9), 1),
    }))
    return 0


def cmd_model_soup(argv: List[str]) -> int:
    p = argparse.ArgumentParser(prog="ia-tpu model-soup")
    p.add_argument("--checkpoints", required=True, nargs="+",
                   help="msgpack param files to average")
    p.add_argument("--output", required=True)
    args = p.parse_args(argv)

    from flax import serialization

    from item_alignment_tpu.aggregate.soup import uniform_soup

    trees = []
    template = None
    for path in args.checkpoints:
        with open(path, "rb") as f:
            raw = f.read()
        if template is None:
            template = serialization.msgpack_restore(raw)
            trees.append(template)
        else:
            trees.append(serialization.msgpack_restore(raw))
    soup = uniform_soup(trees)
    with open(args.output, "wb") as f:
        f.write(serialization.msgpack_serialize(soup))
    print(json.dumps({"output": args.output, "n": len(trees)}))
    return 0


def cmd_pred_text(argv: List[str]) -> int:
    """Encode every KG entity's text with the (pre)trained RoBERTa ->
    pooled feature matrix for the GCN (pred_text.py:65-192: jieba-cut item
    titles / value strings, pooler_output rows in entity-id order).

    Weights are REQUIRED: ``--pretrained_model_path`` (HF dir) and/or
    ``--file_state_dict`` (finetune-text msgpack overlay) — a random
    encoder would silently hand the GCN noise features."""
    p = argparse.ArgumentParser(prog="ia-tpu pred-text")
    p.add_argument("--entity2id", required=True)
    p.add_argument("--item_info", required=True)
    p.add_argument("--vocab_path", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--config_file", default=None)
    p.add_argument("--model_name", default="roberta_large")
    p.add_argument("--pretrained_model_path", default=None,
                   help="HF dir with pytorch_model.bin")
    p.add_argument("--file_state_dict", default=None,
                   help="finetune-text params msgpack (overlays the encoder)")
    p.add_argument("--max_seq_len", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--scan_chunks", type=int, default=8,
                   help="batches encoded per device dispatch (lax.scan)")
    p.add_argument("--num_workers", type=int, default=8,
                   help="tokenizer processes (0 = serial); at 258k+ "
                        "entities serial BertTokenizer dominates the run")
    p.add_argument("--allow_random_weights", action="store_true",
                   help="escape hatch for tests/smoke runs")
    p.add_argument("--quant", default=None, choices=["int8"],
                   help="int8 MXU path for the encoder's dense projections "
                        "(the 258k-entity encode pass is dense-dominated)")
    p.add_argument("--xfer_guard", action="store_true",
                   help="fail on any implicit host->device transfer in the "
                        "encode loop (regression guard for the numpy-params "
                        "per-dispatch re-upload)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from item_alignment_tpu.data.tokenization import (
        load_kg_tokenizers,
        load_text_tokenizer,
    )
    from item_alignment_tpu.models.encoder import Pooler
    from item_alignment_tpu.models.text import RobertaBackbone

    if not (args.pretrained_model_path or args.file_state_dict
            or args.allow_random_weights):
        raise SystemExit(
            "pred-text needs --pretrained_model_path and/or "
            "--file_state_dict; refusing to build the GCN feature matrix "
            "from random weights (pass --allow_random_weights to override)")

    tok = load_text_tokenizer(args.vocab_path)
    ents, _ = load_kg_tokenizers(args.entity2id, args.entity2id)
    id_dict = {}
    with open(args.item_info, encoding="utf-8") as r:
        for line in r:
            d = json.loads(line)
            id_dict[d["item_id"]] = d

    def entity_text(name: str) -> str:
        # the reference jieba-cuts item titles before encoding
        # (pred_text.py:88-92); value strings pass through unchanged
        if name.startswith("/item/"):
            title = id_dict.get(name[len("/item/"):], {}).get("title", "")
            from item_alignment_tpu.data.prepare import segment_title
            return segment_title(title)
        return name.split("/value/")[-1]

    names = sorted(ents, key=lambda n: ents[n])
    # tokenize everything up front (parallel workers: serial BertTokenizer
    # over 258k+ entity texts would dominate the whole command) BEFORE any
    # device work, so the pool never coexists with TPU client state
    texts = [entity_text(n) for n in names]
    if args.num_workers > 1 and len(texts) >= 4 * args.num_workers:
        import multiprocessing as mp

        k = args.num_workers
        sl = (len(texts) + k - 1) // k
        payloads = [(args.vocab_path, texts[i: i + sl], args.max_seq_len)
                    for i in range(0, len(texts), sl)]
        with mp.get_context("spawn").Pool(k) as pool:
            parts = pool.map(_pred_text_tokenize_slice, payloads)
        ids_all = np.concatenate([p[0] for p in parts])
        mask_all = np.concatenate([p[1] for p in parts])
    else:
        enc = tok(texts, padding="max_length", truncation=True,
                  max_length=args.max_seq_len)
        ids_all = np.asarray(enc["input_ids"], np.int32)
        mask_all = np.asarray(enc["attention_mask"], np.int32)

    kw = dict(vocab_size=len(tok), hidden_dropout_prob=0.0,
              attention_probs_dropout_prob=0.0, quant=args.quant)
    if args.config_file:
        cfg = ModelConfig.from_json(args.config_file, **kw)
    elif "large" in args.model_name:
        cfg = ModelConfig.roberta_large().replace(**kw)
    else:
        cfg = ModelConfig(**kw)
    backbone = RobertaBackbone(cfg)
    pooler = Pooler(cfg)
    ids0 = jnp.ones((args.batch_size, args.max_seq_len), jnp.int32)
    bparams = jax.jit(backbone.init)({"params": jax.random.PRNGKey(0)}, ids0)
    pparams = jax.jit(pooler.init)(jax.random.PRNGKey(1),
                                   jnp.ones((1, 1, cfg.hidden_size)))

    hf_bin = (os.path.join(args.pretrained_model_path, "pytorch_model.bin")
              if args.pretrained_model_path else None)
    if hf_bin and not os.path.exists(hf_bin):
        # acceptable only when finetuned weights are supplied instead
        # (e.g. synthetic-corpus rehearsals without HF checkpoints)
        if not args.file_state_dict:
            raise SystemExit(f"{hf_bin} not found and no --file_state_dict")
        logger.warning(f"no {hf_bin}; relying on --file_state_dict weights")
        hf_bin = None
    if hf_bin:
        from item_alignment_tpu.utils.hf_import import (
            convert_encoder_state_dict,
            load_torch_state_dict,
            _overlay,
        )
        sd = load_torch_state_dict(hf_bin)
        tree = convert_encoder_state_dict(sd, cfg.type_vocab_size,
                                          cfg.max_position_embeddings)
        bparams = jax.tree_util.tree_map(np.asarray, bparams)
        for k in ("embeddings", "encoder"):
            _overlay(bparams["params"][k], tree[k])
        # HF RobertaModel ships pooler weights; use them when present
        pkey = [k for k in sd if k.endswith("pooler.dense.weight")]
        if pkey:
            prefix = pkey[0][: -len(".weight")]
            pparams = jax.tree_util.tree_map(np.asarray, pparams)
            pparams["params"]["dense"]["kernel"] = np.asarray(
                sd[prefix + ".weight"]).T.astype(np.float32)
            pparams["params"]["dense"]["bias"] = np.asarray(
                sd[prefix + ".bias"]).astype(np.float32)
        logger.info("loaded pretrained encoder (+pooler) weights")
    if args.file_state_dict:
        # finetuned one-tower params: {"roberta": {embeddings, encoder}, ...}
        from flax import serialization

        from item_alignment_tpu.utils.hf_import import _overlay
        with open(args.file_state_dict, "rb") as f:
            ft = serialization.msgpack_restore(f.read())
        ft = ft.get("params", ft)
        src = ft.get("roberta", ft)
        bparams = jax.tree_util.tree_map(np.asarray, bparams)
        for k in ("embeddings", "encoder"):
            assert k in src, f"no '{k}' subtree in {args.file_state_dict}"
            _overlay(bparams["params"][k], src[k])
        logger.info(f"overlaid finetuned encoder from {args.file_state_dict}")

    @jax.jit
    def encode_k(bparams, pparams, ids, mask):
        # [K, B, S] -> [K, B, H]: K batches per dispatch via lax.scan — a
        # per-batch python loop pays the remote tunnel round trip (~86ms)
        # 1300+ times at reference scale.  Params are jit ARGUMENTS:
        # closed over they would embed as ~1.3GB of HLO constants (round-5
        # GCN finding) and key the compile cache on the checkpoint values,
        # forcing a fresh compile per finetuned checkpoint.
        def body(c, xm):
            x, m = xm
            h = backbone.apply(bparams, x, m)[-1]
            return c, pooler.apply(pparams, h)

        return jax.lax.scan(body, 0, (ids, mask))[1]

    B, K = args.batch_size, max(int(args.scan_chunks), 1)
    n, S = ids_all.shape
    per = B * K
    n_groups = (n + per - 1) // per
    if n_groups * per > n:  # pad the tail to full [K, B] groups (the
        # wasted rows are < one dispatch of compute; masked rows pool to
        # garbage that is sliced off below)
        ids_all = np.pad(ids_all, ((0, n_groups * per - n), (0, 0)))
        mask_all = np.pad(mask_all, ((0, n_groups * per - n), (0, 0)))
    # params are jit ARGUMENTS (see encode_k) but must live on the device
    # as jax.Arrays BEFORE the loop: numpy arguments are re-uploaded on
    # every dispatch — ~1.3GB of fp32 through the remote tunnel per group,
    # 171 times at reference scale, and the per-call host copies OOMed a
    # 125GB host mid-encode (round-5 rehearsal, step 9).
    bparams = jax.device_put(bparams)
    pparams = jax.device_put(pparams)
    # --xfer_guard turns that discipline into a hard error for the loop:
    # every host->device byte below must go through an explicit device_put
    # (under the guard jnp.array(numpy) also counts as implicit)
    import contextlib
    guard = (jax.transfer_guard_host_to_device("disallow")
             if args.xfer_guard else contextlib.nullcontext())
    feats = []
    with guard:
        for g in range(n_groups):
            ids = ids_all[g * per: (g + 1) * per].reshape(K, B, S)
            mask = mask_all[g * per: (g + 1) * per].reshape(K, B, S)
            out = _retry_transient(
                lambda: np.asarray(encode_k(bparams, pparams,
                                            jax.device_put(ids),
                                            jax.device_put(mask))))
            feats.append(out.reshape(per, -1))
            if (g + 1) % 10 == 0 or g + 1 == n_groups:
                logger.info(f"pred-text: {min((g + 1) * per, n)}/{n} encoded")
    matrix = np.concatenate(feats)[:n]
    np.save(args.output, matrix)
    print(json.dumps({"output": args.output, "shape": list(matrix.shape)}))
    return 0


def cmd_build_graph(argv: List[str]) -> int:
    """Build the GCN inputs nothing else produces: the normalized
    item/attribute adjacency (``edges.npz``) and the src_idx/tgt_idx pair
    files. Re-expresses the reference's commented-out adjacency
    construction (data_prepare.py:655-731: item <-> cate_name value,
    item <-> industry_name value, item <-> each pv value, symmetric)
    and the finetune_graph pair indexing (finetune_graph.py:74-125)."""
    p = argparse.ArgumentParser(prog="ia-tpu build-graph")
    p.add_argument("--item_info", required=True)
    p.add_argument("--entity2id", required=True)
    p.add_argument("--train_pairs", required=True,
                   help="item_train_pair.jsonl")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--valid_proportion", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pad_to", type=int, default=None,
                   help="pad the edge list to a static size")
    args = p.parse_args(argv)

    from item_alignment_tpu.data.prepare import load_item_info
    from item_alignment_tpu.data.tokenization import load_kg_tokenizers
    from item_alignment_tpu.ops.sparse import normalize_adjacency, pad_edges

    ents, _ = load_kg_tokenizers(args.entity2id, args.entity2id)
    n_nodes = max(ents.values()) + 1
    src, dst = [], []

    def connect(i: int, tail_key: str) -> None:
        j = ents.get(tail_key)
        if j is None:
            return
        src.extend((i, j))
        dst.extend((j, i))

    n_items = 0
    id_dict, _, _ = load_item_info(args.item_info)  # parses item/sku pvs
    for item_id, d in id_dict.items():
        head = f"/item/{item_id}"
        if head not in ents:
            continue
        n_items += 1
        i = ents[head]
        connect(i, f"/value/{d['cate_name']}-{d['cate_id']}")
        connect(i, f"/value/{d['industry_name']}")
        for vals in (d.get("pvs") or {}).values():
            for v in vals:
                connect(i, f"/value/{v}")
    edge_index = np.stack([np.asarray(src, np.int64),
                           np.asarray(dst, np.int64)])
    # dedup symmetric duplicates (shared pv values repeat across skus)
    edge_index = np.unique(edge_index, axis=1)
    ei, ew = normalize_adjacency(edge_index, n_nodes)
    # dst-sorted list + precomputed transpose (backward adjacency): lets
    # the TPU scatters lower with indices_are_sorted=True (8x faster
    # compile, ~25% faster execution at reference scale)
    from item_alignment_tpu.ops.sparse import sort_edges_by_dst, transpose_edges
    ti, tw = transpose_edges(ei, ew)
    ei, ew = sort_edges_by_dst(ei, ew)
    if args.pad_to:
        ei, ew = pad_edges(ei, ew, args.pad_to, pad_dst=n_nodes - 1)
        ti, tw = pad_edges(ti, tw, args.pad_to, pad_dst=n_nodes - 1)
    os.makedirs(args.output_dir, exist_ok=True)
    edges_path = os.path.join(args.output_dir, "edges.npz")
    np.savez_compressed(edges_path, edge_index=ei, edge_weight=ew,
                        edge_index_t=ti, edge_weight_t=tw,
                        sorted_by_dst=np.bool_(True),
                        n_nodes=np.int64(n_nodes))

    # pair files with entity indices, split like finetune_graph expects
    import random as pyrandom

    e2idx = {k[len("/item/"):]: v for k, v in ents.items()
             if k.startswith("/item/")}
    rows = []
    with open(args.train_pairs, encoding="utf-8") as r:
        for line in r:
            if not line.strip():
                continue
            d = json.loads(line)
            d["src_idx"] = e2idx[d["src_item_id"]]
            d["tgt_idx"] = e2idx[d["tgt_item_id"]]
            rows.append(d)
    pyrandom.Random(args.seed).shuffle(rows)
    n_valid = int(len(rows) * args.valid_proportion)
    out_files = {}
    for name, chunk in (("item_train_valid_pair.jsonl", rows[:n_valid]),
                        ("item_train_train_pair.jsonl", rows[n_valid:])):
        path = os.path.join(args.output_dir, name)
        with open(path, "w", encoding="utf-8") as w:
            for d in chunk:
                w.write(json.dumps(d, ensure_ascii=False) + "\n")
        out_files[name] = len(chunk)
    print(json.dumps({"edges": edges_path, "n_nodes": n_nodes,
                      "n_items": n_items,
                      "n_edges": int(edge_index.shape[1]), **out_files}))
    return 0


def cmd_finetune_image(argv: List[str]) -> int:
    """Image two-tower finetune over npz image shards (finetune_image.py)."""
    p = argparse.ArgumentParser(prog="ia-tpu finetune-image")
    _common_train_flags(p)
    p.add_argument("--shards", nargs="+", required=True,
                   help="npz shards from write_image_shards")
    p.add_argument("--valid_shards", nargs="+", default=None,
                   help="npz shards for the eval split (enables best-F1 "
                        "tracking under --do_eval)")
    p.add_argument("--image_size", type=int, default=288)
    args = p.parse_args(argv)
    if not any(a == "--eval_batch_size" or a.startswith("--eval_batch_size=")
               for a in argv):
        # the shared text default (64) OOMs a 16GB chip for 800-1000px
        # image forwards; the train batch is known to fit (its fwd+bwd
        # does), so eval/predict default to it
        args.eval_batch_size = args.train_batch_size

    from item_alignment_tpu.data.datasets import ArrayDataset
    from item_alignment_tpu.data.images import (
        eval_transform,
        normalize as img_normalize,
        read_image_shards,
    )
    from item_alignment_tpu.engine.train import Trainer
    from item_alignment_tpu.models import build_model

    def load_shard_ds(shard_paths):
        # two passes: count, then fill preallocated arrays in place (a
        # list-of-rows + np.stack would briefly hold 2x the data and OOM
        # the host at 800px).  Post-transform uint8 shards (today's
        # prepare output, marked transformed=True) stay uint8 end-to-end
        # — 4x less host RAM and host->device traffic than fp32; the
        # towers normalize uint8 on-device.  Legacy fp32 shards and RAW
        # uint8 shards (transformed absent/False) land in fp32 buffers.
        n = 0
        first_u8 = None
        for sp in shard_paths:  # npz loads lazily: touch only the metadata
            with np.load(sp, allow_pickle=False) as z:
                n += int(len(z["labels"]))
                if first_u8 is None:
                    first_u8 = bool(
                        z["images_1"].dtype == np.uint8
                        and "transformed" in z.files and z["transformed"])
        side = args.image_size
        buf_dtype = np.uint8 if first_u8 else np.float32
        imgs1 = np.empty((n, side, side, 3), buf_dtype)
        imgs2 = np.empty_like(imgs1)
        labels = np.empty((n,), np.int32)
        src_ids, tgt_ids = [], []
        row = 0
        for shard in read_image_shards(shard_paths):
            is_u8 = shard["images_1"].dtype == np.uint8
            is_transformed = bool(shard.get(
                "transformed", np.bool_(not is_u8)))
            if buf_dtype == np.uint8 and not (is_u8 and is_transformed):
                raise SystemExit(
                    "mixed image shards: post-transform uint8 shards "
                    "cannot be combined with fp32/raw ones in one run")
            # transformed-uint8 rows entering an fp32 buffer (mixed with
            # legacy fp32 shards) must be normalized here — a bare cast
            # would hand the model un-normalized 0..255 floats
            norm_here = is_transformed and is_u8 and buf_dtype == np.float32
            for i in range(len(shard["labels"])):
                if norm_here:
                    imgs1[row] = img_normalize(shard["images_1"][i])
                    imgs2[row] = img_normalize(shard["images_2"][i])
                elif is_transformed:
                    imgs1[row] = shard["images_1"][i]
                    imgs2[row] = shard["images_2"][i]
                else:  # RAW uint8 shard: transform at load (legacy path)
                    imgs1[row] = eval_transform(shard["images_1"][i],
                                                args.image_size)
                    imgs2[row] = eval_transform(shard["images_2"][i],
                                                args.image_size)
                labels[row] = int(shard["labels"][i])
                pid = str(shard["pair_ids"][i])
                sid, _, tid = pid.partition("|")
                src_ids.append(sid)
                tgt_ids.append(tid or sid)
                row += 1
        return ArrayDataset({"images_1": imgs1, "images_2": imgs2,
                             "labels": labels},
                            meta={"src_item_id": src_ids,
                                  "tgt_item_id": tgt_ids})

    ds = load_shard_ds(args.shards)
    valid_ds = load_shard_ds(args.valid_shards) if args.valid_shards else None
    args.interaction_type = "two_tower"  # this command IS the two-tower
    # member; keep the run dir name consistent regardless of the flag
    cfg = _model_config(args, image_model_name=args.model_name,
                        image_size=args.image_size,
                        interaction_type="two_tower")
    out_dir = os.path.join(args.output_dir, run_dir_name(args))
    _dump_hyperparameters(args, out_dir)
    trainer = Trainer(build_model(cfg),
                      _train_config(args, ds.num_batches(args.train_batch_size)),
                      log_dir=args.log_dir)
    if args.do_train:
        trainer.setup(next(ds.batches(args.train_batch_size))[0])
        if args.pretrained_model_path:
            _load_timm_pretrained(trainer, args)
        _maybe_restore(trainer, args)
        result = trainer.fit(ds, (valid_ds or ds) if args.do_eval else None)
        _save_epoch_params(trainer, out_dir, args.epochs, kind="image")
        # predict.sh restores best_f1.msgpack: save the best-eval params, or
        # the final params when training ran without eval (the reference
        # predicts from the last epoch checkpoint, finetune_image.py:390)
        from item_alignment_tpu.engine.checkpoint import save_params
        best = trainer.best_params if trainer.best_params is not None \
            else trainer.state.params
        save_params(os.path.join(out_dir, "best_f1.msgpack"), best)
        print(json.dumps({"best": result["best"]}))
    if args.do_pred:
        if trainer.state is None:
            trainer.setup(next(ds.batches(args.eval_batch_size))[0])
            if args.pretrained_model_path:
                _load_timm_pretrained(trainer, args)
            _maybe_restore(trainer, args)
        path = os.path.join(out_dir,
                            f"deepAI_result_threshold={args.threshold}.jsonl")
        trainer.predict_jsonl(ds, path, args.threshold)
        print(json.dumps({"prediction_file": path}))
    return 0


def cmd_finetune_multimodal(argv: List[str]) -> int:
    """roberta_image one-tower finetune on 9-col TSV with image-embedding
    columns (finetune_multimodal.py)."""
    p = argparse.ArgumentParser(prog="ia-tpu finetune-multimodal")
    _common_train_flags(p)
    p.add_argument("--vocab_path", required=True)
    p.add_argument("--train_file", default="finetune_train_train.tsv")
    p.add_argument("--valid_file", default="finetune_train_valid.tsv")
    p.add_argument("--test_file", default="finetune_test.tsv",
                   help="--do_pred predicts on this when present, else on "
                        "--valid_file")
    p.add_argument("--image_hidden_size", type=int, default=3072)
    p.add_argument("--ensemble", default="begin",
                   choices=["begin", "end", "sum", "cross_attn"])
    p.add_argument("--images_dir", default=None,
                   help="item images dir (<item_id>.jpg/png) for coca models")
    p.add_argument("--image_size", type=int, default=224)
    args = p.parse_args(argv)

    from item_alignment_tpu.data.native_loader import read_tsv_fast
    from item_alignment_tpu.data.tokenization import (
        build_multimodal_pair_dataset,
        load_text_tokenizer,
        rows_to_image_one_tower_dataset,
        rows_to_image_two_tower_dataset,
    )
    from item_alignment_tpu.engine.train import Trainer
    from item_alignment_tpu.models import build_model

    tok = load_text_tokenizer(args.vocab_path)
    cfg = _model_config(args, vocab_size=len(tok), ensemble=args.ensemble,
                        image_hidden_size=args.image_hidden_size,
                        image_size=args.image_size)
    is_coca = "coca" in args.model_name

    def build_ds(fname):
        path = os.path.join(args.data_dir, fname)
        if not os.path.exists(path):
            return None
        rows = read_tsv_fast(path)
        if is_coca:
            assert args.images_dir, "coca finetune needs --images_dir"
            from item_alignment_tpu.data.images import load_image
            from item_alignment_tpu.data.prepare import read_finetune_tsv

            rows9 = read_finetune_tsv(path)
            item_ids = {r[1] for r in rows9} | {r[5] for r in rows9}
            paths = {}
            for iid in item_ids:
                for ext in (".jpg", ".png", ".jpeg"):
                    cand = os.path.join(args.images_dir, iid + ext)
                    if os.path.exists(cand):
                        paths[iid] = cand
                        break
            return build_multimodal_pair_dataset(
                rows9, tok, load_image, paths, cfg.max_seq_len,
                cfg.max_seq_len_pv, cfg.image_size,
                bos=(cfg.ensemble == "sum"))
        if args.interaction_type == "two_tower":
            return rows_to_image_two_tower_dataset(
                rows, tok, cfg.max_seq_len, cfg.max_seq_len_pv,
                args.image_hidden_size, ensemble=cfg.ensemble)
        return rows_to_image_one_tower_dataset(
            rows, tok, cfg.max_seq_len, cfg.max_seq_len_pv,
            args.image_hidden_size, ensemble=cfg.ensemble)

    train_ds = build_ds(args.train_file)
    valid_ds = build_ds(args.valid_file)
    out_dir = os.path.join(args.output_dir, run_dir_name(args))
    _dump_hyperparameters(args, out_dir)
    steps = train_ds.num_batches(args.train_batch_size) if train_ds else 1
    trainer = Trainer(build_model(cfg), _train_config(args, steps),
                      log_dir=args.log_dir)

    def _restore_pretrained(example_ds):
        trainer.setup(next(example_ds.batches(args.eval_batch_size))[0])
        if args.pretrained_model_path:
            # roberta_image starts from the HF text encoder
            # (finetune_multimodal.py from_pretrained); coca from the
            # coca-pretrain checkpoint
            if is_coca:
                _load_coca_pretrained(trainer, args)
            else:
                _load_pretrained(trainer, cfg, args)
        _maybe_restore(trainer, args)

    if args.do_train:
        trainer.setup(next(train_ds.batches(args.train_batch_size))[0])
        if args.pretrained_model_path:
            if is_coca:
                _load_coca_pretrained(trainer, args)
            else:
                _load_pretrained(trainer, cfg, args)
        _maybe_restore(trainer, args)
        result = trainer.fit(train_ds, valid_ds)
        _save_epoch_params(trainer, out_dir, args.epochs, kind="multimodal")
        from item_alignment_tpu.engine.checkpoint import save_params
        best = trainer.best_params if trainer.best_params is not None \
            else trainer.state.params
        save_params(os.path.join(out_dir, "best_f1.msgpack"), best)
        print(json.dumps({"best": result["best"]}))
    if args.do_eval and valid_ds is not None and len(valid_ds) > 0:
        if trainer.state is None:
            _restore_pretrained(valid_ds)
        ev = trainer.evaluate(valid_ds)
        print(json.dumps({"sweep": ev.get("sweep", []),
                          "best_f1": ev.get("best_f1"),
                          "best_threshold": ev.get("best_threshold")}))
    if args.do_pred:
        test_ds = build_ds(args.test_file)
        pred_ds = test_ds if test_ds is not None and len(test_ds) else valid_ds
        if pred_ds is not None:
            if trainer.state is None:
                _restore_pretrained(pred_ds)
            path = os.path.join(
                out_dir, f"deepAI_result_threshold={args.threshold}.jsonl")
            trainer.predict_jsonl(pred_ds, path, args.threshold)
            print(json.dumps({"prediction_file": path,
                              "prediction_split": "test" if pred_ds is test_ds
                              else "valid"}))
    return 0


def cmd_finetune_graph(argv: List[str]) -> int:
    """Full-graph GCNII finetune (finetune_graph.py): loads the node
    feature matrix + normalized edge list, full-batch step per pair batch."""
    p = argparse.ArgumentParser(prog="ia-tpu finetune-graph")
    p.add_argument("--feature_matrix", required=True, help=".npy [N, F]")
    p.add_argument("--edges", required=True,
                   help=".npz with edge_index [2,E] and edge_weight [E]")
    p.add_argument("--train_pairs", required=True,
                   help="jsonl rows {src_idx, tgt_idx, item_label}")
    p.add_argument("--valid_pairs", default=None)
    p.add_argument("--output_dir", default="output/gcn")
    p.add_argument("--gcn_hidden", type=int, default=128)
    p.add_argument("--gcn_layers", type=int, default=4)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--learning_rate", type=float, default=1e-2)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--edge_chunk", type=int, default=None,
                   help="scan the edge list in chunks of this size "
                        "(bounds message-buffer memory at reference scale; "
                        "try 262144 for the 2M-edge CCKS graph)")
    p.add_argument("--scan_layers", action="store_true",
                   help="lax.scan over the GCNII layers instead of "
                        "unrolling them: shrinks the compiled program ~4x. "
                        "REQUIRED at reference scale — the unrolled "
                        "230k+/2M+ compile never finished through the "
                        "remote relay (r5: 322.3 ms/step with scan+chunk, "
                        "benchlogs/r5/gcn_scan_256k.log)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from item_alignment_tpu.engine import metrics as M
    from item_alignment_tpu.models.graph import GCNTwoTower

    feats = np.load(args.feature_matrix)
    ez = np.load(args.edges)
    ei, ew = jnp.asarray(ez["edge_index"]), jnp.asarray(ez["edge_weight"])
    feats_j = jnp.asarray(feats, jnp.float32)

    def load_pairs(path):
        src, tgt, lab = [], [], []
        with open(path, encoding="utf-8") as r:
            for line in r:
                d = json.loads(line)
                src.append(int(d["src_idx"]))
                tgt.append(int(d["tgt_idx"]))
                lab.append(int(d.get("item_label", 0)))
        return (np.asarray(src, np.int32), np.asarray(tgt, np.int32),
                np.asarray(lab, np.int32))

    tr_src, tr_tgt, tr_lab = load_pairs(args.train_pairs)
    # build-graph ships a dst-sorted list + its transpose (backward
    # adjacency) so the scatters lower with indices_are_sorted=True
    sorted_edges = "sorted_by_dst" in ez and bool(ez["sorted_by_dst"])
    trans = None
    if "edge_index_t" in ez:
        trans = (jnp.asarray(ez["edge_index_t"]),
                 jnp.asarray(ez["edge_weight_t"]))
    edge_chunk = args.edge_chunk
    if edge_chunk and ei.shape[1] % edge_chunk:
        from item_alignment_tpu.ops.sparse import pad_edges
        n_nodes = feats.shape[0]
        pad_dst = n_nodes - 1 if sorted_edges else 0
        tgt_e = ((ei.shape[1] + edge_chunk - 1) // edge_chunk) * edge_chunk
        ei_np, ew_np = pad_edges(np.asarray(ei), np.asarray(ew), tgt_e,
                                 pad_dst=pad_dst)
        ei, ew = jnp.asarray(ei_np), jnp.asarray(ew_np)
        if trans is not None:
            ti_np, tw_np = pad_edges(np.asarray(trans[0]),
                                     np.asarray(trans[1]), tgt_e,
                                     pad_dst=pad_dst)
            trans = (jnp.asarray(ti_np), jnp.asarray(tw_np))
    cfg = ModelConfig(model_name="gcn", gcn_hidden=args.gcn_hidden,
                      gcn_layers=args.gcn_layers,
                      gcn_feature_dim=feats.shape[1],
                      gcn_edge_chunk=edge_chunk,
                      gcn_scan_layers=args.scan_layers,
                      gcn_sorted_edges=sorted_edges)
    model = GCNTwoTower(cfg)
    bs = min(args.batch_size, len(tr_src))
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, feats_j, ei, ew,
        jnp.asarray(tr_src[:bs]), jnp.asarray(tr_tgt[:bs]),
        labels=jnp.asarray(tr_lab[:bs]), edge_transpose=trans)
    tx = optax.adam(args.learning_rate)
    opt = tx.init(params)

    # the graph arrays MUST be jit arguments, never closed over: a
    # closed-over [230k, 1024] feature matrix + 2M-edge lists become HLO
    # constants and the lowered module balloons to ~1GB (measured: 214MB
    # at 50k/400k vs 84KB with args), which is what broke the
    # remote-compile relay on every reference-scale attempt in rounds 3-4
    graph_args = (feats_j, ei, ew) + (tuple(trans) if trans is not None
                                      else ())

    @jax.jit
    def step(p, o, s, t, l, rng, feats, eij, ewj, *tr):
        loss, g = jax.value_and_grad(
            lambda p: model.apply(p, feats, eij, ewj, s, t, labels=l,
                                  edge_transpose=tr if tr else None,
                                  deterministic=False,
                                  rngs={"dropout": rng}).loss)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    rng = jax.random.PRNGKey(1)
    for epoch in range(args.epochs):
        order = np.random.RandomState(epoch).permutation(len(tr_src))
        for s0 in range(0, len(order) - bs + 1, bs):
            idx = order[s0:s0 + bs]
            rng, k = jax.random.split(rng)
            params, opt, loss = step(params, opt, jnp.asarray(tr_src[idx]),
                                     jnp.asarray(tr_tgt[idx]),
                                     jnp.asarray(tr_lab[idx]), k,
                                     *graph_args)
        if epoch % 10 == 0:
            logger.info(f"[gcn] epoch {epoch} loss {float(loss):.4f}")

    out = {"final_loss": float(loss)}
    if args.valid_pairs:
        v_src, v_tgt, v_lab = load_pairs(args.valid_pairs)
        probs = []
        eval_fn = jax.jit(lambda p, s, t, feats, eij, ewj, *tr: model.apply(
            p, feats, eij, ewj, s, t,
            edge_transpose=tr if tr else None).probs)
        pad = (-len(v_src)) % bs
        vs = np.concatenate([v_src, np.zeros(pad, np.int32)])
        vt = np.concatenate([v_tgt, np.zeros(pad, np.int32)])
        for s0 in range(0, len(vs), bs):
            probs.append(np.asarray(eval_fn(
                params, jnp.asarray(vs[s0:s0 + bs]),
                jnp.asarray(vt[s0:s0 + bs]), *graph_args)))
        probs = np.concatenate(probs)[: len(v_src)]
        f1, pr, rc, thr = M.find_best_f1_and_threshold(v_lab, probs)
        out.update(best_f1=f1, best_threshold=thr)
    os.makedirs(args.output_dir, exist_ok=True)
    from item_alignment_tpu.engine.checkpoint import save_params
    save_params(os.path.join(args.output_dir, "gcn_params.msgpack"), params)
    print(json.dumps(out))
    return 0


def cmd_coca_pretrain(argv: List[str]) -> int:
    """CoCa caption+contrastive pretrain over (text, image) pairs stored as
    npz shards with input_ids/attention_mask/images (coca_pretrain.py)."""
    p = argparse.ArgumentParser(prog="ia-tpu coca-pretrain")
    p.add_argument("--shards", nargs="+", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--config_file", default=None)
    p.add_argument("--vocab_size", type=int, default=21128)
    p.add_argument("--hidden_size", type=int, default=768)
    p.add_argument("--num_hidden_layers", type=int, default=12)
    p.add_argument("--num_attention_heads", type=int, default=12)
    p.add_argument("--intermediate_size", type=int, default=3072)
    p.add_argument("--multimodal_depth", type=int, default=12)
    p.add_argument("--coca_heads", type=int, default=8)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    _engine_flags(p)
    args = p.parse_args(argv)

    from item_alignment_tpu.data.datasets import ArrayDataset
    from item_alignment_tpu.engine.train import Trainer
    from item_alignment_tpu.models.multimodal import CoCaForPretraining

    kw = dict(model_name="coca", vocab_size=args.vocab_size,
              hidden_size=args.hidden_size,
              num_hidden_layers=args.num_hidden_layers,
              num_attention_heads=args.num_attention_heads,
              intermediate_size=args.intermediate_size,
              multimodal_depth=args.multimodal_depth,
              coca_heads=args.coca_heads,
              image_size=args.image_size,
              dtype="bfloat16" if args.bf16 else "float32")
    cfg = (ModelConfig.from_json(args.config_file, **kw)
           if args.config_file else ModelConfig(**kw))
    model = CoCaForPretraining(cfg)

    data = [np.load(s) for s in args.shards]
    imgs = np.concatenate([d["images"] for d in data])
    if imgs.dtype != np.uint8:
        # float shards must arrive normalized; uint8 ones stay uint8 and
        # the ViT tower normalizes on-device (maybe_normalize_uint8)
        imgs = imgs.astype(np.float32)
    ds = ArrayDataset({
        "input_ids": np.concatenate(
            [d["input_ids"] for d in data]).astype(np.int32),
        "attention_mask": np.concatenate(
            [d["attention_mask"] for d in data]).astype(np.int32),
        "images": imgs,
    })

    import jax

    bs = min(args.batch_size, len(ds))
    tcfg = _engine_train_config(args, train_bs=bs,
                                steps_per_epoch=max(len(ds) // bs, 1))
    trainer = Trainer(model, tcfg, log_dir=args.log_dir)
    result = trainer.fit(ds)

    from item_alignment_tpu.engine.checkpoint import save_params
    save_params(os.path.join(args.output_dir, "coca_pretrain.msgpack"),
                {"params": jax.tree.map(np.asarray, trainer.state.params)})
    print(json.dumps(
        {"final_loss": result["history"][-1]["loss"]}))
    return 0


def cmd_finetune_bert(argv: List[str]) -> int:
    """Legacy 5-field BertAlignModel finetune with optional adversarial
    embedding noise (finetune_bert.py)."""
    p = argparse.ArgumentParser(prog="ia-tpu finetune-bert")
    p.add_argument("--train_file", required=True,
                   help="jsonl rows with src_/tgt_ fields + item_label")
    p.add_argument("--valid_file", default=None)
    p.add_argument("--vocab_path", required=True)
    p.add_argument("--output_dir", default="output/bert_legacy")
    p.add_argument("--config_file", default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--learning_rate", type=float, default=2e-5)
    p.add_argument("--adversarial", default=None,
                   choices=[None, "FREE", "PGD", "MIX"])
    p.add_argument("--epsilon", type=float, default=1e-2)
    p.add_argument("--alpha", type=float, default=1e-2)
    p.add_argument("--threshold", type=float, default=0.4)
    p.add_argument("--pretrained_model_path", default=None,
                   help="bert_pretrain.msgpack (or its dir): the "
                        "domain-pretrained backbone to start from "
                        "(reference finetune_bert.py loads the "
                        "bert_pretrain output)")
    _engine_flags(p)
    args = p.parse_args(argv)

    import jax

    from item_alignment_tpu.data.bert_data import (
        pairs_to_field_dataset,
        unflatten_fields,
    )
    from item_alignment_tpu.data.tokenization import load_text_tokenizer
    from item_alignment_tpu.engine.train import Trainer
    from item_alignment_tpu.models.bert_legacy import (
        BertAlignModel,
        FIELD_MAX_LENS,
        sim_eval_weight,
    )

    tok = load_text_tokenizer(args.vocab_path)

    def load_rows(path):
        with open(path, encoding="utf-8") as r:
            return [json.loads(line) for line in r if line.strip()]

    kw = dict(model_name="bert_legacy", vocab_size=len(tok),
              dtype="bfloat16" if args.bf16 else "float32")
    cfg = (ModelConfig.from_json(args.config_file, **kw)
           if args.config_file else ModelConfig(**kw))
    model = BertAlignModel(cfg)
    train_ds = pairs_to_field_dataset(load_rows(args.train_file), tok)
    valid_ds = (pairs_to_field_dataset(load_rows(args.valid_file), tok)
                if args.valid_file else None)

    def transform(batch):
        batch = dict(batch)
        labels = batch.pop("labels", None)
        kwargs = {"fields": unflatten_fields(batch)}
        if labels is not None:
            kwargs["labels"] = labels
        return kwargs

    bs = min(args.batch_size, len(train_ds))
    adversarial = ((args.adversarial, args.epsilon, args.alpha)
                   if args.adversarial else None)
    noise_spec = {
        "pvs_noise": (FIELD_MAX_LENS["pvs"], cfg.hidden_size),
        "title_noise": (FIELD_MAX_LENS["title"], cfg.hidden_size),
    } if args.adversarial else None
    tcfg = _engine_train_config(args, train_bs=bs,
                                steps_per_epoch=max(len(train_ds) // bs, 1))
    trainer = Trainer(model, tcfg, log_dir=args.log_dir,
                      batch_transform=transform, adversarial=adversarial,
                      noise_spec=noise_spec)
    if args.pretrained_model_path:
        from flax import serialization

        from item_alignment_tpu.parallel.sharding import shard_params
        from item_alignment_tpu.utils.hf_import import _overlay_rows

        path = args.pretrained_model_path
        if os.path.isdir(path):
            path = os.path.join(path, "bert_pretrain.msgpack")
        with open(path, "rb") as f:
            pre = serialization.msgpack_restore(f.read())
        pre = pre.get("params", pre)
        trainer.setup(next(train_ds.batches(bs))[0])
        params = jax.tree_util.tree_map(np.asarray, trainer.state.params)
        assert "bert" in pre and "bert" in params, \
            f"{path} has no 'bert' backbone subtree"
        # row-tolerant: bert-pretrain uses 5 token types (one per field),
        # the align model fewer — overlapping rows are copied
        _overlay_rows(params["bert"], pre["bert"])
        trainer.state = trainer.state.replace(
            params=shard_params(params, trainer.mesh))
        logger.info(f"loaded pretrained bert backbone from {path}")
    result = trainer.fit(train_ds, valid_ds)

    os.makedirs(args.output_dir, exist_ok=True)
    from item_alignment_tpu.engine.checkpoint import save_params
    params = jax.tree.map(np.asarray, trainer.state.params)
    save_params(os.path.join(args.output_dir, "bert_align.msgpack"),
                {"params": params})
    w, b = sim_eval_weight({"params": params})
    np.savez(os.path.join(args.output_dir, "sim_eval_weight.npz"),
             weight=np.asarray(w), bias=np.asarray(b))
    if trainer.best_params is not None:
        save_params(os.path.join(args.output_dir, "best_f1.msgpack"),
                    {"params": jax.tree.map(np.asarray, trainer.best_params)})

    out = {"final_loss": result["history"][-1]["loss"] if result["history"]
           else None}
    if valid_ds is not None:
        out.update(best_f1=result["best"]["best_f1"],
                   best_threshold=result["best"].get("threshold"))
    print(json.dumps(out))
    return 0


def cmd_bert_pretrain(argv: List[str]) -> int:
    """Structure-aware MLM+NSP domain pretrain (bert_pretrain.py): builds
    whole-field / title-match / per-pv masked examples + negative 'next'
    examples from item_info.jsonl and trains BertForPretraining."""
    p = argparse.ArgumentParser(prog="ia-tpu bert-pretrain")
    p.add_argument("--item_info", required=True)
    p.add_argument("--vocab_path", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--config_file", default=None)
    p.add_argument("--max_seq_len", type=int, default=254)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--n_negatives", type=int, default=1)
    p.add_argument("--max_items", type=int, default=None)
    _engine_flags(p)
    args = p.parse_args(argv)

    import random as pyrandom

    import jax

    from item_alignment_tpu.data.bert_data import build_pretrain_examples
    from item_alignment_tpu.data.datasets import ArrayDataset
    from item_alignment_tpu.data.tokenization import load_text_tokenizer
    from item_alignment_tpu.engine.train import Trainer
    from item_alignment_tpu.models.bert_legacy import BertForPretraining

    tok = load_text_tokenizer(args.vocab_path)
    items = []
    with open(args.item_info, encoding="utf-8") as r:
        for line in r:
            d = json.loads(line)
            d.setdefault("cate_name_path", d.get("cate_path", ""))
            items.append(d)
            if args.max_items and len(items) >= args.max_items:
                break
    rng = pyrandom.Random(args.seed)
    examples = []
    for item in items:
        examples.extend(build_pretrain_examples(
            item, tok, args.max_seq_len, items, rng, args.n_negatives))
    logger.info(f"[bert-pretrain] {len(examples)} examples from {len(items)} items")
    ds = ArrayDataset({
        "input_ids": np.asarray([e["input_ids"] for e in examples], np.int32),
        "attention_mask": np.asarray([e["attention_mask"] for e in examples], np.int32),
        "token_type_ids": np.asarray([e["token_type_ids"] for e in examples], np.int32),
        "mlm_labels": np.asarray([e["label_ids"] for e in examples], np.int32),
        "next_label": np.asarray([e["next_label"] for e in examples], np.int32),
    })

    kw = dict(model_name="bert_legacy", vocab_size=len(tok),
              type_vocab_size=5,
              dtype="bfloat16" if args.bf16 else "float32")
    cfg = (ModelConfig.from_json(args.config_file, **kw)
           if args.config_file else ModelConfig(**kw))
    model = BertForPretraining(cfg)
    bs = min(args.batch_size, len(ds))
    tcfg = _engine_train_config(args, train_bs=bs,
                                steps_per_epoch=max(len(ds) // bs, 1))
    trainer = Trainer(model, tcfg, log_dir=args.log_dir)
    result = trainer.fit(ds)

    from item_alignment_tpu.engine.checkpoint import save_params
    os.makedirs(args.output_dir, exist_ok=True)
    save_params(os.path.join(args.output_dir, "bert_pretrain.msgpack"),
                {"params": jax.tree.map(np.asarray, trainer.state.params)})
    print(json.dumps({"final_loss": result["history"][-1]["loss"],
                      "examples": len(examples)}))
    return 0


def cmd_pred_bert(argv: List[str]) -> int:
    """Legacy inference: sigmoid(pooled . w + b) with the exported sim-eval
    weight, written in submission format (pred_bert.py:102-245)."""
    p = argparse.ArgumentParser(prog="ia-tpu pred-bert")
    p.add_argument("--test_file", required=True)
    p.add_argument("--vocab_path", required=True)
    p.add_argument("--params", required=True, help="bert_align.msgpack")
    p.add_argument("--config_file", default=None)
    p.add_argument("--output", required=True)
    p.add_argument("--threshold", type=float, default=0.4)
    p.add_argument("--batch_size", type=int, default=8)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from item_alignment_tpu.data.bert_data import (
        pairs_to_field_dataset,
        unflatten_fields,
    )
    from item_alignment_tpu.data.tokenization import load_text_tokenizer
    from item_alignment_tpu.models.bert_legacy import BertAlignModel

    tok = load_text_tokenizer(args.vocab_path)
    kw = dict(model_name="bert_legacy", vocab_size=len(tok))
    cfg = (ModelConfig.from_json(args.config_file, **kw)
           if args.config_file else ModelConfig(**kw))
    model = BertAlignModel(cfg)

    rows = [json.loads(l) for l in open(args.test_file, encoding="utf-8")
            if l.strip()]
    for r in rows:
        r.setdefault("item_label", 0)
    ds = pairs_to_field_dataset(rows, tok)
    bs = min(args.batch_size, len(ds))
    first = next(ds.batches(bs))[0]
    first.pop("labels")
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                 unflatten_fields(first))
    from item_alignment_tpu.engine.checkpoint import load_params
    params = load_params(args.params, params)

    eval_fn = jax.jit(lambda p, f: model.apply(p, f).probs)
    # warm up one batch: a Pallas/Mosaic compile failure surfaces at XLA
    # compile time, OUTSIDE ops/attention.py's call-time fallback — catch
    # it here and fall back to XLA attention instead of aborting the
    # whole predict pipeline
    try:
        wfields = {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
                   for k, v in unflatten_fields(dict(first)).items()}
        _retry_transient(lambda: np.asarray(eval_fn(params, wfields)))
    except Exception as e:
        from item_alignment_tpu.utils.retry import TRANSIENT_MARKERS
        if any(t in str(e) for t in TRANSIENT_MARKERS):
            # the relay/tunnel is down, not the kernel — an XLA-attention
            # fallback would fail the same way; surface the outage instead
            raise
        logger.warning(f"fused-attention compile failed ({e}); pred-bert "
                       "falling back to XLA attention")
        model = BertAlignModel(cfg.replace(use_flash_attention=False))
        eval_fn = jax.jit(lambda p, f: model.apply(p, f).probs)
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "w", encoding="utf-8") as w:
        i = 0
        for batch, meta in ds.batches(bs):
            batch.pop("labels")
            fields = {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
                      for k, v in unflatten_fields(batch).items()}
            probs = _retry_transient(
                lambda f=fields: np.asarray(eval_fn(params, f)))
            probs = probs[: meta["n_valid"]]
            for prob in probs:
                row = rows[i]
                w.write(json.dumps({
                    "src_item_id": row.get("src_item_id", ""),
                    "src_item_emb": "[0]",
                    "tgt_item_id": row.get("tgt_item_id", ""),
                    "tgt_item_emb": f"[{float(prob)}]",
                    "threshold": args.threshold}) + "\n")
                i += 1
    print(json.dumps({"output": args.output, "pairs": i}))
    return 0


COMMANDS = {
    "prepare": cmd_prepare,
    "build-graph": cmd_build_graph,
    "finetune-text": cmd_finetune_text,
    "finetune-image": cmd_finetune_image,
    "finetune-multimodal": cmd_finetune_multimodal,
    "finetune-graph": cmd_finetune_graph,
    "finetune-bert": cmd_finetune_bert,
    "bert-pretrain": cmd_bert_pretrain,
    "coca-pretrain": cmd_coca_pretrain,
    "pkgm-pretrain": cmd_pkgm_pretrain,
    "pred-text": cmd_pred_text,
    "pred-bert": cmd_pred_bert,
    "mine": cmd_mine,
    "model-soup": cmd_model_soup,
    "ensemble": cmd_ensemble,
}


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: ia-tpu <command> [flags]\ncommands: "
              + ", ".join(sorted(COMMANDS)))
        return 0
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"unknown command: {cmd}\ncommands: "
              + ", ".join(sorted(COMMANDS)), file=sys.stderr)
        return 2
    return COMMANDS[cmd](argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
