"""Trainer hook tests: debug images, early stop, TensorBoard, progressive."""

import glob

import numpy as np
import pytest

from enhax.models.base import build_model
from enhax.train import (
    DebugImageHook, EarlyStopHook, ProgressiveTrainingHook, TensorBoardHook,
    Trainer,
)


@pytest.fixture
def batch(rng):
    return {"image": rng.uniform(0, 0.3, (2, 16, 16, 3)).astype(np.float32),
            "ref_image": rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)}


def _trainer(model, tmp_path, hooks, epochs=3):
    return Trainer(model, {"optimizer": {"name": "adam", "lr": 1e-3}},
                   max_epochs=epochs, save_dir=tmp_path,
                   log_every_n_steps=1000, hooks=hooks)


def test_debug_image_hook(batch, tmp_path):
    m = build_model("zero_dce_re", num_channels=8)
    tr = _trainer(m, tmp_path, [DebugImageHook(batch, every_n_epochs=1)])
    tr.fit(lambda: [batch])
    dumps = glob.glob(str(tmp_path / "debug" / "epoch_*" / "*.jpg"))
    assert len(dumps) == 6  # 3 epochs x 2 items


def test_early_stop_hook(batch, tmp_path):
    m = build_model("zero_dce_re", num_channels=8)
    hook = EarlyStopHook(monitor="val/psnr", patience=1, min_delta=100.0)
    tr = _trainer(m, tmp_path, [hook], epochs=20)
    tr.fit(lambda: [batch], val_iter_fn=lambda: [batch])
    assert tr.max_epochs < 20  # stopped early (no +100dB improvements)


def test_tensorboard_hook(batch, tmp_path):
    m = build_model("zero_dce_re", num_channels=8)
    tr = _trainer(m, tmp_path,
                  [TensorBoardHook(image_batch=batch, image_every_n_epochs=1)])
    tr.fit(lambda: [batch], val_iter_fn=lambda: [batch])
    events = glob.glob(str(tmp_path / "tb" / "events.*"))
    assert events and sum(__import__("os").path.getsize(e) for e in events) > 100


def test_progressive_hook_changes_schedule(batch, tmp_path):
    from enhax.constants import DATAMODULES
    import cv2
    root = tmp_path / "data"
    d = root / "lol_v1" / "train" / "image"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        cv2.imwrite(str(d / f"{i}.png"),
                    (rng.uniform(0, 1, (40, 40, 3)) * 255).astype(np.uint8))
    dm = DATAMODULES.build("lol_v1", root=root, batch_size=4)
    dm.setup("train")
    hook = ProgressiveTrainingHook(dm, milestones=(0, 1), sizes=(16, 32),
                                   batch_sizes=(4, 1))
    assert dm.batch_size == 4
    size, bs = hook.apply_for_epoch(1)
    assert (size, bs) == (32, 1)
    assert dm.batch_size == 1
    item = dm.train[0]
    assert item["image"].shape[:2] == (32, 32)


def test_preemption_checkpoint(batch, tmp_path):
    """SIGTERM mid-training -> checkpoint saved, loop exits cleanly."""
    import os
    import signal

    m = build_model("zero_dce_re", num_channels=8)
    tr = Trainer(m, {"optimizer": {"name": "adam", "lr": 1e-3}},
                 max_epochs=1000, save_dir=tmp_path,
                 ckpt_dir=tmp_path / "ckpt", log_every_n_steps=10**6)

    def batches():
        yield batch
        os.kill(os.getpid(), signal.SIGTERM)  # preempt after first batch
        yield batch

    state = tr.fit(lambda: batches())
    assert (tmp_path / "ckpt" / "last").is_dir()
    assert int(state.step) >= 1
    # resume picks up the preemption checkpoint
    tr2 = Trainer(m, {"optimizer": {"name": "adam", "lr": 1e-3}},
                  max_epochs=3, ckpt_dir=tmp_path / "ckpt")
    state2 = tr2.fit(lambda: [batch])
    assert int(state2.step) > int(state.step)
