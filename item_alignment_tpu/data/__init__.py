from item_alignment_tpu.data.datasets import ArrayDataset  # noqa: F401
