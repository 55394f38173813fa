from item_alignment_tpu.utils.logging import logger  # noqa: F401

# Reference checkpoint-file naming (src/utils/config.py:2-7)
ROBERTA_WEIGHTS_NAME = "pytorch_model.bin"
KG_WEIGHTS_NAME = "pkgm_model.bin"
COCA_WEIGHTS_NAME = "coca_model.bin"
VIT_WEIGHTS_NAME = "image_encoder.bin"
BOS_TOKEN = "<S>"
