from item_alignment_tpu.models.outputs import PairClassifierOutput  # noqa: F401
from item_alignment_tpu.models.text import (  # noqa: F401
    PKGMOneTower,
    PKGMTwoTower,
    RobertaOneTower,
    RobertaTwoTower,
    TextCNN,
    TextCNNTwoTower,
)
from item_alignment_tpu.models.image import (  # noqa: F401
    ImageTwoTower,
    NFNet,
    ResNetV2,
    ViT,
)
from item_alignment_tpu.models.multimodal import (  # noqa: F401
    CoCaForItemAlignment,
    CoCaForPretraining,
    RobertaImageOneTower,
    RobertaImageTwoTower,
)
from item_alignment_tpu.models.graph import GCNII, GCNTwoTower  # noqa: F401


def build_model(config):
    """Model dispatch by name substring, mirroring the reference's
    ``finetune_*.py`` selection logic (finetune_text.py:218-241,
    finetune_image.py:191-218, finetune_multimodal.py:209-231)."""
    name = config.model_name
    one_tower = config.interaction_type == "one_tower"
    if "pkgm" in name:
        return PKGMOneTower(config) if one_tower else PKGMTwoTower(config)
    if "textcnn" in name:
        return TextCNNTwoTower(config)
    if "roberta_image" in name:
        return (RobertaImageOneTower(config) if one_tower
                else RobertaImageTwoTower(config))
    if "coca" in name:
        return CoCaForItemAlignment(config)
    if any(k in name for k in ("vit", "resnet", "nfnet")):
        return ImageTwoTower(config)
    if "gcn" in name:
        return GCNTwoTower(config)
    if "roberta" in name or "bert" in name:
        return RobertaOneTower(config) if one_tower else RobertaTwoTower(config)
    raise ValueError(f"unknown model name: {name}")
