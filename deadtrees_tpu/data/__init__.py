from deadtrees_tpu.data.augment import augment_batch, normalize, sample_augment_params
from deadtrees_tpu.data.config import (
    DATASET_CONFIG,
    DATASET_CONFIG_IMAGENET,
    DatasetConfig,
)
from deadtrees_tpu.data.pipeline import DataConfig, DeadtreesDataModule
from deadtrees_tpu.data.shards import discover_shards, split_shards
from deadtrees_tpu.data.tar import (
    ShardSampleStream,
    cache_shard,
    count_shard_samples,
    decode_sample,
    expand_shard_urls,
    is_remote_shard,
    iter_tar_samples,
    open_shard,
)

__all__ = [
    "DATASET_CONFIG",
    "DATASET_CONFIG_IMAGENET",
    "DataConfig",
    "DatasetConfig",
    "DeadtreesDataModule",
    "ShardSampleStream",
    "augment_batch",
    "cache_shard",
    "count_shard_samples",
    "decode_sample",
    "discover_shards",
    "expand_shard_urls",
    "is_remote_shard",
    "iter_tar_samples",
    "open_shard",
    "normalize",
    "sample_augment_params",
    "split_shards",
]
