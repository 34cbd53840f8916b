"""Predict-time source dispatch.

Rebuild of reference ``dataset/utils.py:21-93`` ``parse_io_worker``:
registered dataset name -> dataset; directory/image -> ImageLoader; video
file -> VideoLoader + paired VideoWriterCV.
"""

from __future__ import annotations

from enhax.constants import DATASETS, Split
from enhax.data.dataset import ImageLoader, VideoLoader
from enhax.utils.pathlib import Path


def parse_io_worker(src, dst=None, split=Split.TEST, transform=None, **kwargs):
    """Returns (data_source, data_writer_or_None)."""
    writer = None
    src_str = str(src)
    if src_str in DATASETS:
        ds_cls = DATASETS.get(src_str)
        root = kwargs.pop("root", None)
        source = ds_cls(root, split=split, transform=transform, **kwargs)
        return source, writer

    path = Path(src_str)
    if path.is_dir() or (path.is_file() and path.is_image_file()):
        return ImageLoader(path, transform=transform), writer
    if path.is_file() and path.is_video_file():
        loader = VideoLoader(path, transform=transform)
        if dst is not None:
            from enhax.ops.video import make_video_writer
            writer = make_video_writer(Path(dst), fps=loader.fps)
        return loader, writer
    raise ValueError(f"cannot resolve data source {src!r} "
                     f"(not a registered dataset, directory, image, or video)")
