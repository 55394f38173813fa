from item_alignment_tpu.kge.graph import KnowledgeGraph, load_ccks  # noqa: F401
from item_alignment_tpu.kge.models import KGEModel, make_kge_model  # noqa: F401
from item_alignment_tpu.kge.sampling import (  # noqa: F401
    BernoulliNegativeSampler,
    PositionalNegativeSampler,
    UniformNegativeSampler,
)
from item_alignment_tpu.kge.inference import (  # noqa: F401
    EntityInference,
    RelationInference,
)
from item_alignment_tpu.kge.train import KGETrainer  # noqa: F401
from item_alignment_tpu.kge.evaluation import LinkPredictionEvaluator  # noqa: F401
