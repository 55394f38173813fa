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
from typing import List, Optional

import numpy as np

from item_alignment_tpu.config import (
    MeshConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)
from item_alignment_tpu.utils import logger


def run_dir_name(args) -> str:
    sim = args.similarity_measure or "NA"
    return (f"{args.model_name}-{args.data_version}-{args.interaction_type}-"
            f"{args.classification_method}-{sim}-{args.loss_type}")


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
    p.add_argument("--log_steps", type=int, default=100)
    p.add_argument("--seed", type=int, default=2345)
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (replaces the reference's fp16 AMP)")
    p.add_argument("--mesh", default="-1,1,1",
                   help="data,fsdp,tensor axis sizes (-1 = rest)")
    p.add_argument("--do_train", action="store_true")
    p.add_argument("--do_eval", action="store_true")
    p.add_argument("--do_pred", action="store_true")


def _model_config(args, **extra) -> ModelConfig:
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
    )
    kw.update(extra)
    if args.config_file:
        return ModelConfig.from_json(args.config_file, **kw)
    if "large" in args.model_name:
        base = ModelConfig.roberta_large().replace(**kw)
        return base
    return ModelConfig(**kw)


def _train_config(args, steps_per_epoch: int) -> TrainConfig:
    data, fsdp, tensor = (int(x) for x in args.mesh.split(","))
    return TrainConfig(
        seed=args.seed, train_batch_size=args.train_batch_size,
        eval_batch_size=args.eval_batch_size, num_epochs=args.epochs,
        log_steps=args.log_steps, output_dir=args.output_dir,
        threshold=args.threshold,
        mesh=MeshConfig(data=data, fsdp=fsdp, tensor=tensor),
        optimizer=OptimizerConfig(
            learning_rate=args.learning_rate,
            weight_decay=args.weight_decay,
            warmup_proportion=args.warmup_proportion,
            total_steps=max(steps_per_epoch * args.epochs, 1),
            grad_accumulation_steps=args.gradient_accumulation_steps),
    )


def _dump_hyperparameters(args, out_dir: str) -> None:
    """hyperparamter.txt dump (finetune_text.py:380-383)."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "hyperparamter.txt"), "w") as w:
        for k, v in sorted(vars(args).items()):
            w.write(f"{k}={v}\n")


# ------------------------------------------------------------- commands
def cmd_prepare(argv: List[str]) -> int:
    p = argparse.ArgumentParser(prog="ia-tpu prepare")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--valid_proportion", type=float, default=0.1)
    p.add_argument("--num_train_augment", type=int, default=0)
    p.add_argument("--num_neg", type=int, default=5)
    p.add_argument("--prev_valid", default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    from item_alignment_tpu.data.prepare import prepare_all

    files = prepare_all(args.data_dir, args.output_dir,
                        valid_proportion=args.valid_proportion,
                        seed=args.seed,
                        num_train_augment=args.num_train_augment,
                        num_neg=args.num_neg, prev_valid=args.prev_valid)
    print(json.dumps(files))
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
    trainer = Trainer(build_model(cfg), _train_config(args, steps))

    if args.do_train:
        first = next(train_ds.batches(args.train_batch_size))[0]
        trainer.setup(first)
        if args.pretrained_model_path:
            _load_pretrained(trainer, cfg, args)
        result = trainer.fit(train_ds, valid_ds)
        _save_epoch_params(trainer, out_dir, args.epochs)
        print(json.dumps({"best": result["best"]}))
    if args.do_eval and valid_ds is not None:
        if trainer.state is None:
            trainer.setup(next(valid_ds.batches(args.eval_batch_size))[0])
            _maybe_restore(trainer, args)
        ev = trainer.evaluate(valid_ds)
        print(json.dumps({"sweep": ev["sweep"], "best_f1": ev["best_f1"],
                          "best_threshold": ev["best_threshold"]}))
    if args.do_pred and valid_ds is not None:
        if trainer.state is None:
            trainer.setup(next(valid_ds.batches(args.eval_batch_size))[0])
            _maybe_restore(trainer, args)
        path = os.path.join(out_dir,
                            f"deepAI_result_threshold={args.threshold}.jsonl")
        trainer.predict_jsonl(valid_ds, path, args.threshold)
        print(json.dumps({"prediction_file": path}))
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
    trainer.state = trainer.state.replace(params=params["params"])
    logger.info("loaded pretrained encoder weights")


def _save_epoch_params(trainer, out_dir: str, epoch: int) -> None:
    from item_alignment_tpu.engine.checkpoint import save_params

    path = os.path.join(out_dir, f"text_finetune_epoch-{epoch}.msgpack")
    save_params(path, trainer.state.params)
    logger.info(f"saved {path}")


def _maybe_restore(trainer, args) -> None:
    if args.file_state_dict and os.path.exists(args.file_state_dict):
        from item_alignment_tpu.engine.checkpoint import load_params

        params = load_params(args.file_state_dict, trainer.state.params)
        trainer.state = trainer.state.replace(params=params)


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
                         save_epochs=args.save_epochs)
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
            rows = read_prediction_file(
                os.path.join(args.data_dir, "output", model_dir,
                             args.input_file))
            out.append((rows, float(thr), float(f1)))
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
    """Encode every KG entity's text -> feature matrix for the GCN
    (pred_text.py:65-192)."""
    p = argparse.ArgumentParser(prog="ia-tpu pred-text")
    p.add_argument("--entity2id", required=True)
    p.add_argument("--item_info", required=True)
    p.add_argument("--vocab_path", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--max_seq_len", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--hidden_size", type=int, default=128)
    p.add_argument("--num_hidden_layers", type=int, default=2)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from item_alignment_tpu.data.tokenization import (
        load_kg_tokenizers,
        load_text_tokenizer,
    )
    from item_alignment_tpu.models.text import RobertaBackbone
    from item_alignment_tpu.models.encoder import Pooler

    tok = load_text_tokenizer(args.vocab_path)
    ents, _ = load_kg_tokenizers(args.entity2id, args.entity2id)
    id_dict = {}
    with open(args.item_info, encoding="utf-8") as r:
        for line in r:
            d = json.loads(line)
            id_dict[d["item_id"]] = d

    def entity_text(name: str) -> str:
        if name.startswith("/item/"):
            return id_dict.get(name[len("/item/"):], {}).get("title", "")
        return name.split("/value/")[-1]

    names = sorted(ents, key=lambda n: ents[n])
    cfg = ModelConfig(vocab_size=len(tok), hidden_size=args.hidden_size,
                      num_hidden_layers=args.num_hidden_layers,
                      num_attention_heads=4,
                      intermediate_size=args.hidden_size * 4,
                      hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    backbone = RobertaBackbone(cfg)
    pooler = Pooler(cfg)
    ids0 = jnp.ones((args.batch_size, args.max_seq_len), jnp.int32)
    bparams = jax.jit(backbone.init)({"params": jax.random.PRNGKey(0)}, ids0)
    pparams = jax.jit(pooler.init)(jax.random.PRNGKey(1),
                                   jnp.ones((1, 1, cfg.hidden_size)))

    @jax.jit
    def encode(ids, mask):
        h = backbone.apply(bparams, ids, mask)[-1]
        return pooler.apply(pparams, h)

    feats = []
    for s in range(0, len(names), args.batch_size):
        chunk = names[s:s + args.batch_size]
        enc = tok([entity_text(n) for n in chunk], padding="max_length",
                  truncation=True, max_length=args.max_seq_len)
        ids = np.asarray(enc["input_ids"], np.int32)
        mask = np.asarray(enc["attention_mask"], np.int32)
        pad = args.batch_size - len(chunk)
        if pad:
            ids = np.pad(ids, ((0, pad), (0, 0)))
            mask = np.pad(mask, ((0, pad), (0, 0)))
        out = np.asarray(encode(jnp.array(ids), jnp.array(mask)))
        feats.append(out[: len(chunk)])
    matrix = np.concatenate(feats)
    np.save(args.output, matrix)
    print(json.dumps({"output": args.output, "shape": list(matrix.shape)}))
    return 0


COMMANDS = {
    "prepare": cmd_prepare,
    "finetune-text": cmd_finetune_text,
    "pkgm-pretrain": cmd_pkgm_pretrain,
    "pred-text": cmd_pred_text,
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
