from item_alignment_tpu.aggregate.soup import uniform_soup  # noqa: F401
from item_alignment_tpu.aggregate.ensemble import (  # noqa: F401
    ensemble_predictions,
    read_prediction_file,
    write_prediction_file,
)
