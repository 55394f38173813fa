from item_alignment_tpu.ops.attention import (  # noqa: F401
    dot_product_attention,
    flash_attention,
    make_attention_bias,
)
from item_alignment_tpu.ops.dropout import (  # noqa: F401
    ReplayDropout,
    replay_dropout,
)
from item_alignment_tpu.ops.sparse import (  # noqa: F401
    normalize_adjacency,
    pad_edges,
    spmm,
)
