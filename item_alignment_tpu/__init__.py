"""item-alignment-tpu: a TPU-native (JAX/Flax/pjit/Pallas) framework with the
capabilities of sunzeyeah/item-alignment (CCKS2022 same-product mining)."""

__version__ = "0.1.0"

from item_alignment_tpu.config import (  # noqa: F401
    MeshConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)
