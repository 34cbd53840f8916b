"""Dataset bases: multimodal path-rewriting, folder and video loaders.

Rebuild of reference ``core/data/dataset/`` — ``Dataset`` ABC
(base.py:44-313: get_data -> filter -> verify -> cache pipeline, dict-of-
lists store), ``MultimodalDataset`` (base.py:318-532: companion modalities by
path rewriting — ``ref_image`` from ``…/ref/``, ``depth`` from
``…/{root}_{depth_source}/``), ``ImageLoader`` (image.py:32) and
``VideoLoader`` (video.py:35,138).
"""

from __future__ import annotations

import pickle
from typing import Any, Iterator

import numpy as np

from enhax.constants import Split
from enhax.data.annotation import (
    DatapointAttributes, DepthMapAnnotation, ImageAnnotation, collate_datapoints,
)
from enhax.utils.console import console
from enhax.utils.pathlib import Path


class Dataset:
    """Map-style dataset over annotation lists (reference base.py:44).

    Subclasses set class attrs ``tasks``/``splits``/``datapoint_attrs`` and
    implement ``get_data()`` filling ``self.datapoints`` (dict of lists).
    """

    tasks: tuple = ()
    splits: tuple = (Split.TRAIN, Split.VAL, Split.TEST)
    datapoint_attrs = DatapointAttributes()
    has_test_annotations: bool = False

    def __init__(self, root, split=Split.TRAIN, transform=None, to_tensor: bool = True,
                 cache_data: bool = False, verbose: bool = False):
        self.root = Path(root)
        self.split = Split.from_value(split)
        self.transform = transform
        self.to_tensor = to_tensor
        self.verbose = verbose
        self.datapoints: dict[str, list] = {k: [] for k in self.datapoint_attrs}
        self.init_data(cache_data=cache_data)

    # -- pipeline (reference base.py:216-256,392-410) -------------------------

    def init_data(self, cache_data: bool = False):
        cache_file = self.root / f".cache_{self.__class__.__name__}_{self.split}.pkl"
        if cache_data and cache_file.is_file():
            with open(cache_file, "rb") as f:
                self.datapoints = pickle.load(f)
        else:
            self.get_data()
            if cache_data:
                with open(cache_file, "wb") as f:
                    pickle.dump(self.datapoints, f)
        self.filter_data()
        self.verify_data()

    def get_data(self):
        raise NotImplementedError

    def filter_data(self):
        pass

    def verify_data(self):
        """Non-empty + consistent per-attr lengths (reference base.py:485)."""
        lengths = {k: len(v) for k, v in self.datapoints.items() if v}
        if not lengths:
            raise RuntimeError(
                f"{self.__class__.__name__}: no data found under {self.root}")
        n = len(self)
        for k, l in lengths.items():
            if l != n:
                raise RuntimeError(
                    f"{self.__class__.__name__}: attribute {k!r} has {l} items, "
                    f"expected {n}")
        if self.verbose:
            console.print(f"[data] {self.__class__.__name__}/{self.split}: {n} items")

    # -- access ----------------------------------------------------------------

    def __len__(self) -> int:
        main = self.main_attribute
        return len(self.datapoints.get(main, []))

    @property
    def main_attribute(self) -> str:
        return next(iter(self.datapoint_attrs), "image")

    def __getitem__(self, index: int) -> dict:
        item: dict[str, Any] = {}
        meta = {}
        for attr, ann_list in self.datapoints.items():
            ann = ann_list[index] if index < len(ann_list) else None
            if ann is None:
                item[attr] = None
                continue
            item[attr] = ann.data
            if attr == self.main_attribute:
                meta = ann.meta
        item["meta"] = meta
        if self.transform is not None:
            item = self.transform(item)
        return item

    def __iter__(self) -> Iterator[dict]:
        for i in range(len(self)):
            yield self[i]

    def collate(self, items: list[dict]) -> dict:
        return collate_datapoints(items, self.datapoint_attrs)


class MultimodalDataset(Dataset):
    """Dataset that derives companion modalities by path rewriting
    (reference base.py:412-479).

    Subclasses fill ``self.datapoints['image']``; this base derives:
      * ``ref_image``: nearest ``…/ref/`` sibling dir, matched by filename
        (``lq/`` or split dir replaced by ``ref/`` / ``hq/`` / ``gt/``);
      * ``depth``: sibling dir ``{parent}_{depth_source}``.
    Missing companions stay None and are dropped by ``filter_data`` when the
    attribute is required.
    """

    datapoint_attrs = DatapointAttributes(image=ImageAnnotation)
    depth_source: str = "dav2_vitb_g"
    ref_dir_names: tuple = ("ref", "hq", "gt", "high", "target", "clean")

    def derive_ref_images(self):
        refs = []
        for ann in self.datapoints.get("image", []):
            refs.append(self._find_companion(ann.path, self.ref_dir_names))
        if any(r is not None for r in refs):
            self.datapoints["ref_image"] = refs

    def derive_depth(self):
        depths = []
        for ann in self.datapoints.get("image", []):
            parent = ann.path.parent
            cand_dirs = [parent.with_name(f"{parent.name}_{self.depth_source}")]
            found = None
            for d in cand_dirs:
                c = self._match_stem(d, ann.path.stem)
                if c is not None:
                    found = DepthMapAnnotation(c, source=self.depth_source)
                    break
            depths.append(found)
        if any(d is not None for d in depths):
            self.datapoints["depth"] = depths

    def _find_companion(self, path: Path, dir_names: tuple) -> ImageAnnotation | None:
        parent = path.parent
        for name in dir_names:
            for cand_dir in (parent.with_name(name), parent.parent / name):
                c = self._match_stem(cand_dir, path.stem)
                if c is not None:
                    return ImageAnnotation(c)
        return None

    @staticmethod
    def _match_stem(directory: Path, stem: str) -> Path | None:
        if not directory.is_dir():
            return None
        from enhax.constants import IMAGE_EXTS
        for ext in IMAGE_EXTS:
            c = directory / f"{stem}{ext}"
            if c.is_file():
                return c
        return None

    def filter_data(self):
        """Drop items missing a required non-None companion."""
        required = [k for k in self.datapoint_attrs if k in self.datapoints]
        if not required:
            return
        n = len(self.datapoints.get("image", []))
        keep = []
        for i in range(n):
            ok = True
            for k in required:
                lst = self.datapoints.get(k, [])
                if i < len(lst) and lst[i] is None:
                    ok = False
            if ok:
                keep.append(i)
        if len(keep) != n:
            for k, lst in self.datapoints.items():
                if lst:
                    self.datapoints[k] = [lst[i] for i in keep]


class ImageLoader(Dataset):
    """Unlabeled recursive folder loader for predict mode (reference image.py:32)."""

    datapoint_attrs = DatapointAttributes(image=ImageAnnotation)
    splits = (Split.PREDICT,)

    def __init__(self, root, **kwargs):
        kwargs.setdefault("split", Split.PREDICT)
        super().__init__(root, **kwargs)

    def get_data(self):
        root = Path(self.root)
        files = root.image_files() if root.is_dir() else [root]
        self.datapoints["image"] = [ImageAnnotation(f) for f in files]


class VideoLoader:
    """Frame-streaming dataset over cv2.VideoCapture (reference video.py:138).

    Iterates datapoints {"image": HWC float, "meta": {...}}.
    """

    def __init__(self, path, transform=None, to_tensor: bool = True):
        from enhax.ops.video import VideoReaderCV
        self.path = Path(path)
        self.reader = VideoReaderCV(self.path)
        self.transform = transform

    def __len__(self) -> int:
        return len(self.reader)

    @property
    def fps(self):
        return self.reader.fps

    def __iter__(self):
        for i, frame in enumerate(self.reader):
            item = {"image": frame,
                    "meta": {"index": i, "path": str(self.path),
                             "stem": f"{self.path.stem}_{i:06d}",
                             "name": f"{self.path.stem}_{i:06d}.png",
                             "shape": frame.shape}}
            if self.transform is not None:
                item = self.transform(item)
            yield item
