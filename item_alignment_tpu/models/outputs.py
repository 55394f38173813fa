"""Universal model output struct.

JAX pytree equivalent of the reference's ``SequenceClassifierOutput``
(``src/models/base.py:160-186``): every pair model returns
(loss, logits, probs, src_embeds, tgt_embeds).
"""

from __future__ import annotations

from typing import Optional

import jax
from flax import struct


@struct.dataclass
class PairClassifierOutput:
    logits: Optional[jax.Array] = None
    probs: Optional[jax.Array] = None
    src_embeds: Optional[jax.Array] = None
    tgt_embeds: Optional[jax.Array] = None
    loss: Optional[jax.Array] = None
