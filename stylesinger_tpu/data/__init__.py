"""Data layer: binarized shard IO, datasets, static-shape bucketed batching.

Mirrors the reference's storage/batching layer (``utils/indexed_datasets.py``,
``tasks/StyleSinger/dataset.py``, fairseq ``batch_by_size``) with one key
TPU-native change: batches are padded to a small set of **static shape
buckets** (frames x tokens) so XLA compiles a handful of graphs instead of
recompiling per batch shape.
"""

from stylesinger_tpu.data.indexed_dataset import (  # noqa: F401
    IndexedDataset, IndexedDatasetBuilder,
)
from stylesinger_tpu.data.dataset import StyleSingerDataset  # noqa: F401
from stylesinger_tpu.data.batching import (  # noqa: F401
    BucketBatcher, EpochBatches, batch_by_size, collate_batch, pad_to,
)
