from item_alignment_tpu.engine.metrics import (  # noqa: F401
    find_best_f1_and_threshold,
    precision_recall_f1,
    threshold_sweep,
)
from item_alignment_tpu.engine.train import Trainer, TrainState  # noqa: F401
from item_alignment_tpu.engine.inference import TwoTowerInference  # noqa: F401
from item_alignment_tpu.engine.adversarial import (  # noqa: F401
    free_update,
    make_adversarial_step,
    mix_update,
    pgd_update,
)
from item_alignment_tpu.engine.checkpoint import (  # noqa: F401
    CheckpointManager,
    load_params,
    merge_param_sources,
    save_params,
)
from item_alignment_tpu.engine.observability import (  # noqa: F401
    EvalWriter,
    ScalarLogger,
    StepTimer,
    profile_trace,
)
