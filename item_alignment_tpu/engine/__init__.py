from item_alignment_tpu.engine.metrics import (  # noqa: F401
    find_best_f1_and_threshold,
    precision_recall_f1,
    threshold_sweep,
)
from item_alignment_tpu.engine.train import Trainer, TrainState  # noqa: F401
