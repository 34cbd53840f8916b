"""Data layer tests with a synthetic on-disk LOL-style dataset."""

import numpy as np
import pytest

import enhax
from enhax.constants import DATAMODULES, DATASETS, Split
from enhax.data import (
    Compose, DataModule, ImageLoader, RandomCrop, RandomFlip, ResizeMultipleOf,
    batch_iterator, parse_io_worker,
)
from enhax.data.annotation import ImageAnnotation, collate_datapoints


@pytest.fixture(scope="module")
def lol_root(tmp_path_factory):
    """Fake LOL-v1 layout: root/lol_v1/{train,test}/{image,ref,image_dav2_vitb_g}."""
    import cv2
    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    for split in ("train", "test"):
        for sub in ("image", "ref", "image_dav2_vitb_g"):
            d = root / "lol_v1" / split / sub
            d.mkdir(parents=True)
            for i in range(4):
                img = (rng.uniform(0, 1, (20, 24, 3)) * 255).astype(np.uint8)
                cv2.imwrite(str(d / f"{i:03d}.png"), img)
    return root


def test_many_datasets_registered():
    for name in ("lol_v1", "lol_v2_real", "sice", "rain100", "reside_its",
                 "snow100k", "gtsnow", "dicm", "ulol", "satehaze1k",
                 "cityscapes_rain", "fivek_a"):
        assert name in DATASETS, name
        assert name in DATAMODULES, name
    assert len(DATASETS) >= 70


def test_lol_dataset_loads(lol_root):
    ds = DATASETS.build("lol_v1", root=lol_root, split="train")
    assert len(ds) == 4
    item = ds[0]
    assert item["image"].shape == (20, 24, 3)
    assert item["image"].dtype == np.float32
    assert item["ref_image"].shape == (20, 24, 3)
    assert item["depth"].shape == (20, 24, 1)
    assert item["meta"]["name"] == "000.png"


def test_lol_datamodule_and_loader(lol_root):
    dm = DATAMODULES.build("lol_v1", root=lol_root, batch_size=2)
    dm.setup()
    assert len(dm.train) == 4 and len(dm.test) == 4
    batches = list(dm.train_loader())
    assert len(batches) == 2
    b = batches[0]
    assert b["image"].shape == (2, 20, 24, 3)
    assert b["ref_image"].shape == (2, 20, 24, 3)


def test_transforms_pipeline(lol_root):
    t = Compose([RandomCrop(16, seed=0), RandomFlip(p=1.0, seed=0),
                 ResizeMultipleOf(8)])
    ds = DATASETS.build("lol_v1", root=lol_root, split="train", transform=t)
    item = ds[0]
    assert item["image"].shape == (16, 16, 3)
    assert item["ref_image"].shape == (16, 16, 3)
    assert item["depth"].shape[2] == 1


def test_transform_applies_same_crop(lol_root):
    t = RandomCrop(8, seed=1)
    ds = DATASETS.build("lol_v1", root=lol_root, split="train")
    item = ds[0]
    # image == ref here? no — random images. Crop both from identical arrays:
    dp = {"image": item["image"].copy(), "ref_image": item["image"].copy()}
    out = t(dp)
    np.testing.assert_array_equal(out["image"], out["ref_image"])


def test_image_loader(lol_root):
    loader = ImageLoader(lol_root / "lol_v1" / "test" / "image")
    assert len(loader) == 4
    item = loader[0]
    assert item["image"].ndim == 3


def test_parse_io_worker_dir(lol_root):
    src, writer = parse_io_worker(lol_root / "lol_v1" / "test" / "image")
    assert isinstance(src, ImageLoader)
    assert writer is None


def test_parse_io_worker_dataset_name(lol_root):
    src, _ = parse_io_worker("lol_v1", root=lol_root, split=Split.TEST)
    assert len(src) == 4


def test_parse_io_worker_bad_source():
    with pytest.raises(ValueError, match="cannot resolve"):
        parse_io_worker("definitely_not_a_dataset_xyz")


def test_collate_mixed():
    items = [{"image": np.zeros((4, 4, 3), np.float32), "label": 1, "meta": {"i": 0}},
             {"image": np.ones((4, 4, 3), np.float32), "label": 2, "meta": {"i": 1}}]
    b = collate_datapoints(items)
    assert b["image"].shape == (2, 4, 4, 3)
    assert list(b["label"]) == [1, 2]
    assert isinstance(b["meta"], list)


def test_empty_dataset_raises(tmp_path):
    with pytest.raises(RuntimeError, match="no data found"):
        DATASETS.build("lol_v1", root=tmp_path, split="train")


def test_annotation_lazy_probe(lol_root):
    p = lol_root / "lol_v1" / "train" / "image" / "000.png"
    ann = ImageAnnotation(p)
    assert ann.shape == (20, 24, 3)  # probed without decode
    assert ann.meta["stem"] == "000"


def test_prefetch_to_device(lol_root):
    from enhax.data import prefetch_to_device
    ds = DATASETS.build("lol_v1", root=lol_root, split="train")
    it = prefetch_to_device(batch_iterator(ds, batch_size=2))
    batches = list(it)
    assert len(batches) == 2
    assert hasattr(batches[0]["image"], "devices") or hasattr(batches[0]["image"], "device")


def test_prefetch_propagates_producer_errors():
    """A decode/collate error in the prefetch thread must re-raise in the
    consumer, not truncate the epoch (r3 review)."""
    from enhax.data.datamodule import prefetch_to_device

    def bad_iterator():
        yield {"image": np.zeros((1, 4, 4, 3), np.float32)}
        raise RuntimeError("corrupt image")

    it = prefetch_to_device(bad_iterator())
    next(it)
    with pytest.raises(RuntimeError, match="corrupt image"):
        next(it)


def test_train_loader_reshuffles_each_epoch(lol_root):
    """Each train_loader() call (one per epoch) uses a fresh permutation,
    like the reference's DataLoader(shuffle=True) (r3 review)."""
    from enhax.constants import DATAMODULES
    dm = DATAMODULES.build("lol_v1", root=lol_root, batch_size=4)
    dm.setup("train")
    b1 = next(iter(dm.train_loader()))["image"]
    b2 = next(iter(dm.train_loader()))["image"]
    assert b1.shape == b2.shape
    assert np.abs(b1 - b2).max() > 0  # different order/composition


def test_resize_transform_label_maps_nearest():
    """int32 segmentation maps resize with nearest neighbor (no fabricated
    classes, no cv2 int32 crash) while images stay bilinear."""
    from enhax.data.transforms import Resize
    seg = np.zeros((20, 20, 1), np.int32)
    seg[10:, 10:] = 7
    dp = {"image": np.random.default_rng(0).uniform(0, 1, (20, 20, 3))
          .astype(np.float32),
          "segmentation": seg}
    out = Resize(32)(dp)
    assert out["segmentation"].dtype == np.int32
    assert set(np.unique(out["segmentation"])) <= {0, 7}
    assert out["image"].shape == (32, 32, 3)


def test_num_workers_batches_identical(lol_root):
    """Thread-pool decode (num_workers>0) yields byte-identical batches in
    the same order as the serial path (reference DataLoader num_workers
    analog, core/data/datamodule.py:85-90)."""
    from enhax.data.datamodule import batch_iterator

    ds = DATASETS.build("lol_v1", root=lol_root, split="train")
    serial = list(batch_iterator(ds, batch_size=3, shuffle=True, seed=7))
    pooled = list(batch_iterator(ds, batch_size=3, shuffle=True, seed=7,
                                 num_workers=4))
    assert len(serial) == len(pooled) == 2
    for a, b in zip(serial, pooled):
        assert set(a) == set(b)
        for k in a:
            if isinstance(a[k], np.ndarray):
                np.testing.assert_array_equal(a[k], b[k])


def test_datamodule_num_workers_loader(lol_root):
    dm = DATAMODULES.build("lol_v1", root=lol_root, batch_size=2,
                           num_workers=2)
    dm.setup()
    batches = list(dm.train_loader())
    assert len(batches) == 2
    assert batches[0]["image"].shape == (2, 20, 24, 3)
