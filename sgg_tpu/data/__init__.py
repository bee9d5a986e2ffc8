"""Data layer: padded graph batches, dataset parsers, input pipeline."""

from sgg_tpu.data.graph_batch import GraphBatch, pack_ragged  # noqa: F401
from sgg_tpu.data.synthetic import SyntheticSGGDataset  # noqa: F401
