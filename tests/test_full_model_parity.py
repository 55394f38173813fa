"""Full-model output parity: our RobertaOneTower vs the reference's torch
RobertaOneTower with identical (converted) weights — the BASELINE.json
"logits within 1e-3" harness, on a tiny random-initialized model.

The reference module is loaded directly from /root/reference as an oracle
(package shims avoid its timm/torch_geometric-importing __init__ files).
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference")


@pytest.fixture(scope="module")
def ref_text():
    import transformers  # noqa: F401  (import before any stubbing)

    refsrc = types.ModuleType("refsrc")
    refsrc.__path__ = [os.path.join(REF, "src")]
    sys.modules.setdefault("refsrc", refsrc)
    models_pkg = types.ModuleType("refsrc.models")
    models_pkg.__path__ = [os.path.join(REF, "src", "models")]
    sys.modules.setdefault("refsrc.models", models_pkg)
    # the reference's ModelOutput subclass predates transformers' @dataclass
    # enforcement; swap in an attribute-bag shim before text.py imports it
    base = importlib.import_module("refsrc.models.base")

    class ShimOutput(dict):
        def __init__(self, **kw):
            super().__init__(**kw)
            self.__dict__.update(kw)

    base.SequenceClassifierOutput = ShimOutput
    return importlib.import_module("refsrc.models.text")


def _torch_config(method="cls", cls_layers="1", cls_pool="cat"):
    from transformers import BertConfig

    cfg = BertConfig(vocab_size=200, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64, type_vocab_size=4,
                     hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    cfg.classification_method = method
    cfg.similarity_measure = "cosine"
    cfg.loss_type = "ce"
    cfg.loss_margin = 0.0
    cfg.cls_layers = cls_layers
    cfg.cls_pool = cls_pool
    cfg.auxiliary_task = False
    cfg.classifier_dropout = 0.0
    cfg.max_seq_len = 4
    cfg.max_seq_len_pv = 4
    cfg.ensemble = None
    cfg.num_labels = 2
    return cfg


def _convert_full(sd, method):
    """reference state_dict -> our full param tree pieces."""
    from item_alignment_tpu.utils.hf_import import convert_encoder_state_dict

    enc = convert_encoder_state_dict(
        {k[len("roberta."):]: v for k, v in sd.items()
         if k.startswith("roberta.")})
    head = {}
    if method == "cls":
        head["classifier"] = {
            "dense": {"kernel": sd["classifier.dense.weight"].T,
                      "bias": sd["classifier.dense.bias"]},
            "out_proj": {"kernel": sd["classifier.out_proj.weight"].T,
                         "bias": sd["classifier.out_proj.bias"]},
        }
    else:
        head["classifier"] = {
            "dense": {"kernel": sd["classifier.dense.weight"].T,
                      "bias": sd["classifier.dense.bias"]},
        }
    return enc, head


@pytest.mark.parametrize("method,cls_layers,cls_pool", [
    ("cls", "1", "cat"),
    ("cls", "1,2", "cat"),
    ("cls", "1,2", "avg"),
    ("vec_sim", "1", "cat"),
])
def test_one_tower_parity(ref_text, method, cls_layers, cls_pool):
    import torch

    from item_alignment_tpu.config import ModelConfig
    from item_alignment_tpu.models.text import RobertaOneTower

    tcfg = _torch_config(method, cls_layers, cls_pool)
    ref_model = ref_text.RobertaOneTower(tcfg)
    ref_model.eval()
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    cfg = ModelConfig(
        vocab_size=200, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=4,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        classifier_dropout=0.0, classification_method=method,
        similarity_measure="cosine", loss_type="ce",
        cls_layers=tuple(int(i) for i in cls_layers.split(",")),
        cls_pool=cls_pool, max_seq_len=4, max_seq_len_pv=4,
        use_flash_attention=False)
    model = RobertaOneTower(cfg)

    rs = np.random.RandomState(0)
    B, S = 3, cfg.pair_seq_len
    ids = rs.randint(1, 200, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    tt = np.zeros((B, S), np.int32)

    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                 jnp.array(ids), jnp.array(mask),
                                 jnp.array(tt))
    tree = jax.tree_util.tree_map(np.asarray, params)
    enc, head = _convert_full(sd, method)
    from item_alignment_tpu.utils.hf_import import _overlay
    _overlay(tree["params"]["roberta"]["embeddings"], enc["embeddings"])
    _overlay(tree["params"]["roberta"]["encoder"], enc["encoder"])
    _overlay(tree["params"]["head"], head)

    out = jax.jit(model.apply)(tree, jnp.array(ids), jnp.array(mask),
                               jnp.array(tt))
    with torch.no_grad():
        ref_out = ref_model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            token_type_ids=torch.tensor(tt, dtype=torch.long),
            output_hidden_states=True)

    ours_probs = np.asarray(out.probs)
    theirs_probs = ref_out.probs.numpy()
    np.testing.assert_allclose(ours_probs, theirs_probs, atol=1e-3,
                               err_msg=f"{method}/{cls_layers}/{cls_pool}")
    if method == "cls":
        np.testing.assert_allclose(np.asarray(out.logits),
                                   ref_out.logits.numpy(), atol=1e-3)
