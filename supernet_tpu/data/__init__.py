from supernet_tpu.data.loaders import (
    BatchIterator,
    PickleDataset,
    StreamingPickleDataset,
    center_crop_np,
    load_hippocampus_pickle,
)
from supernet_tpu.data.synthetic import synthetic_dataset

__all__ = [
    "BatchIterator",
    "PickleDataset",
    "StreamingPickleDataset",
    "center_crop_np",
    "load_hippocampus_pickle",
    "synthetic_dataset",
]
