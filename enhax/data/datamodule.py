"""DataModule + batch iteration + device prefetch.

Rebuild of reference ``core/data/datamodule.py:28-253`` (Lightning datamodule
building train/val/test/predict DataLoaders with pin_memory + persistent
workers) as a JAX-native pipeline: numpy batch iterators with shuffling and a
background-thread double buffer that overlaps host decode with device
compute (``prefetch_to_device`` replaces pin_memory/non_blocking).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import numpy as np

from enhax.constants import Split
from enhax.data.annotation import collate_datapoints
from enhax.utils.console import console


def batch_iterator(dataset, batch_size: int = 8, shuffle: bool = False,
                   drop_last: bool = False, seed: int = 0,
                   collate_fn: Callable | None = None,
                   num_workers: int = 0) -> Iterator[dict]:
    """Yield collated numpy batch dicts from a map-style dataset.

    ``num_workers > 0`` decodes the samples of each batch on a thread
    pool — the analog of DataLoader(num_workers=...) in the reference
    datamodule (core/data/datamodule.py:28-120). cv2/np decode releases
    the GIL, so threads give real parallelism without the process-fork
    cost torch pays; batch order and content are identical either way.
    """
    n = len(dataset)
    idx = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    collate = collate_fn or getattr(dataset, "collate", None) or collate_datapoints

    def batches():
        for start in range(0, n, batch_size):
            sel = idx[start : start + batch_size]
            if drop_last and len(sel) < batch_size:
                break
            yield sel

    if num_workers and num_workers > 0:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=int(num_workers)) as pool:
            for sel in batches():
                yield collate(list(pool.map(
                    lambda i: dataset[int(i)], sel)))
    else:
        for sel in batches():
            yield collate([dataset[int(i)] for i in sel])


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Background-thread prefetch: decode/collate on host while the device
    computes (replaces DataLoader workers + pin_memory)."""
    import jax

    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()

    def producer():
        try:
            for batch in iterator:
                placed = {}
                for k, v in batch.items():
                    if isinstance(v, np.ndarray) and v.ndim >= 1 and sharding is not None:
                        placed[k] = jax.device_put(v, sharding)
                    elif isinstance(v, np.ndarray):
                        placed[k] = jax.device_put(v)
                    else:
                        placed[k] = v
                q.put(placed)
        except BaseException as e:  # noqa: BLE001
            # re-raise in the consumer — a decode/collate error must not
            # masquerade as a clean (truncated) end of epoch
            q.put(e)
            return
        q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, BaseException):
            raise item
        yield item


class DataModule:
    """Builds per-split iterators from a registered dataset class.

    Mirrors the reference DataModule surface: ``setup(stage)``, ``.train``
    ``.val`` ``.test`` ``.predict`` datasets, ``train_loader()`` etc.
    """

    tasks: tuple = ()
    dataset_cls = None
    dataset_splits: tuple = (Split.TRAIN, Split.TEST)

    def __init__(self, root=None, batch_size: int = 8, shuffle: bool = True,
                 transform=None, val_transform=None, drop_last: bool = False,
                 seed: int = 0, verbose: bool = False, num_workers: int = 0,
                 **dataset_kwargs):
        self.root = root
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.transform = transform
        self.val_transform = val_transform
        self.drop_last = drop_last
        self.seed = seed
        self.verbose = verbose
        self.num_workers = num_workers
        self.dataset_kwargs = dataset_kwargs
        self.train = self.val = self.test = self.predict = None

    # -- setup (reference datamodule.py:47-120) -------------------------------

    def setup(self, stage: str | None = None):
        cls = self.dataset_cls
        if cls is None:
            raise ValueError(f"{type(self).__name__} has no dataset_cls")
        has_val = Split.VAL in self.dataset_splits
        has_test = Split.TEST in self.dataset_splits
        def try_build(split, transform):
            try:
                return cls(self.root, split=split, transform=transform,
                           verbose=self.verbose, **self.dataset_kwargs)
            except RuntimeError:
                return None  # split not present on disk

        if stage in (None, "train"):
            self.train = cls(self.root, split=Split.TRAIN, transform=self.transform,
                             verbose=self.verbose, **self.dataset_kwargs)
            val_split = Split.VAL if has_val else (Split.TEST if has_test else Split.TRAIN)
            self.val = try_build(val_split, self.val_transform)
        if stage in (None, "test"):
            t_split = Split.TEST if has_test else Split.TRAIN
            self.test = try_build(t_split, self.val_transform)
        return self

    # -- loaders ----------------------------------------------------------------

    def train_loader(self):
        # reshuffle per call (the Trainer calls this once per epoch, like
        # the reference's DataLoader(shuffle=True) re-permuting each epoch)
        epoch = getattr(self, "_train_loader_calls", 0)
        self._train_loader_calls = epoch + 1
        return batch_iterator(self.train, self.batch_size, shuffle=self.shuffle,
                              drop_last=self.drop_last, seed=self.seed + epoch,
                              num_workers=self.num_workers)

    def val_loader(self):
        return batch_iterator(self.val, self.batch_size, shuffle=False,
                              num_workers=self.num_workers)

    def test_loader(self):
        return batch_iterator(self.test, self.batch_size, shuffle=False,
                              num_workers=self.num_workers)

    def split_train_val(self, ratio: float = 0.8, seed: int = 0):
        """Split self.train into train/val subsets (reference datamodule.py:223)."""
        import numpy as np
        n = len(self.train)
        idx = np.arange(n)
        np.random.default_rng(seed).shuffle(idx)
        cut = int(n * ratio)

        class _Subset:
            def __init__(s, ds, indices):
                s.ds = ds
                s.indices = list(indices)
                s.collate = ds.collate

            def __len__(s):
                return len(s.indices)

            def __getitem__(s, i):
                return s.ds[s.indices[i]]

        base = self.train
        self.train = _Subset(base, idx[:cut])
        self.val = _Subset(base, idx[cut:])
        return self

    def summarize(self):
        rows = []
        for name in ("train", "val", "test", "predict"):
            ds = getattr(self, name)
            if ds is not None:
                rows.append({"split": name, "items": len(ds),
                             "class": type(ds).__name__})
        if rows:
            from enhax.utils.console import print_table
            print_table(rows, title=type(self).__name__)
