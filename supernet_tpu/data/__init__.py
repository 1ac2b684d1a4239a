from supernet_tpu.data.augment import (
    AugmentConfig,
    augment_batch,
    augment_train_batch,
    augment_volumes,
)
from supernet_tpu.data.loaders import (
    BatchIterator,
    PickleDataset,
    StreamingPickleDataset,
    center_crop_np,
    load_hippocampus_pickle,
)
from supernet_tpu.data.nifti import (
    convert_nifti_dir,
    volume_to_cube,
    read_nifti,
    volume_to_slices,
    write_nifti,
)
from supernet_tpu.data.shards import (
    ShardDataset,
    convert_pickles,
    shard_pairs,
    write_shards,
)
from supernet_tpu.data.synthetic import synthetic_dataset, synthetic_volumes

__all__ = [
    "AugmentConfig",
    "augment_batch",
    "augment_train_batch",
    "augment_volumes",
    "BatchIterator",
    "PickleDataset",
    "ShardDataset",
    "StreamingPickleDataset",
    "center_crop_np",
    "convert_nifti_dir",
    "convert_pickles",
    "load_hippocampus_pickle",
    "read_nifti",
    "shard_pairs",
    "synthetic_dataset",
    "volume_to_slices",
    "write_nifti",
    "write_shards",
    "volume_to_cube",
    "synthetic_volumes",
]
