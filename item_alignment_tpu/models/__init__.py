from item_alignment_tpu.models.outputs import PairClassifierOutput  # noqa: F401
from item_alignment_tpu.models.text import (  # noqa: F401
    PKGMOneTower,
    PKGMTwoTower,
    RobertaOneTower,
    RobertaTwoTower,
    TextCNN,
    TextCNNTwoTower,
)
