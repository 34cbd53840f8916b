"""Data layer: annotations, datasets, datamodules, transforms, IO dispatch.

TPU-native rebuild of reference ``src/mon/core/data/`` + ``src/mon/dataset/``
(8,978 LoC): lazy image annotations, the multimodal path-rewriting dataset
base, ~80 registered benchmark datasets, folder/video predict loaders and a
prefetching datamodule that feeds NHWC numpy batches to jitted steps.
"""

from enhax.data.annotation import (
    ImageAnnotation, DepthMapAnnotation, FrameAnnotation,
    SemanticSegmentationAnnotation, CategoryAnnotation, ClassLabels,
    DatapointAttributes,
)
from enhax.data.dataset import Dataset, MultimodalDataset, ImageLoader, VideoLoader
from enhax.data.datamodule import DataModule, batch_iterator, prefetch_to_device
from enhax.data.transforms import Compose, RandomCrop, RandomFlip, Resize, ResizeMultipleOf
from enhax.data import datasets  # registers the benchmark datasets
from enhax.data.io_worker import parse_io_worker
