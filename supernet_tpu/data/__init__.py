from supernet_tpu.data.loaders import (
    BatchIterator,
    PickleDataset,
    StreamingPickleDataset,
    center_crop_np,
    load_hippocampus_pickle,
)
from supernet_tpu.data.shards import (
    ShardDataset,
    convert_pickles,
    shard_pairs,
    write_shards,
)
from supernet_tpu.data.synthetic import synthetic_dataset

__all__ = [
    "BatchIterator",
    "PickleDataset",
    "ShardDataset",
    "StreamingPickleDataset",
    "center_crop_np",
    "convert_pickles",
    "load_hippocampus_pickle",
    "shard_pairs",
    "synthetic_dataset",
    "write_shards",
]
