"""Video predict pipeline + inpainting + split_train_val tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from enhax.models.base import build_model


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    import cv2
    path = tmp_path_factory.mktemp("vid") / "clip.mp4"
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10, (48, 32))
    rng = np.random.default_rng(0)
    for i in range(6):
        frame = (rng.uniform(0, 0.3, (32, 48, 3)) * 255).astype(np.uint8)
        w.write(frame)
    w.release()
    return path


def test_video_loader(video_path):
    from enhax.data.dataset import VideoLoader
    loader = VideoLoader(video_path)
    frames = list(loader)
    assert len(frames) == 6
    assert frames[0]["image"].shape == (32, 48, 3)
    assert frames[0]["meta"]["index"] == 0


def test_parse_io_worker_video(video_path, tmp_path):
    from enhax.data.io_worker import parse_io_worker
    src, writer = parse_io_worker(video_path, dst=tmp_path / "out.mp4")
    assert writer is not None
    n = 0
    for item in src:
        writer.write(item["image"])
        n += 1
    writer.close()
    assert n == 6
    assert (tmp_path / "out.mp4").stat().st_size > 0


def test_video_predict_end_to_end(video_path, tmp_path):
    """Full video enhancement: read -> model -> write (BASELINE config 5)."""
    from enhax.data.io_worker import parse_io_worker
    from enhax.infer import Predictor
    m = build_model("zero_dce++_re", num_channels=8)
    pred = Predictor(m)
    src, writer = parse_io_worker(video_path, dst=tmp_path / "enhanced.mp4")
    for item in src:
        out = pred.infer({"image": item["image"]})
        writer.write(np.asarray(jnp.clip(out["enhanced"][0], 0, 1)))
    writer.close()
    assert (tmp_path / "enhanced.mp4").stat().st_size > 0


def test_lama_inpainting(rng):
    m = build_model("lama", features=8, n_blocks=2)
    img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    mask = jnp.zeros((1, 32, 32, 1)).at[:, 8:16, 8:16].set(1.0)
    dp = {"image": img, "mask": mask, "ref_image": img}
    params = m.init(jax.random.PRNGKey(0), dp)
    out = m.apply(params, dp)
    assert out["enhanced"].shape == img.shape
    # unmasked pixels must be identical to the input (composite contract)
    unmasked = np.asarray((1 - mask) * (out["enhanced"] - img))
    np.testing.assert_allclose(unmasked, 0.0, atol=1e-6)
    loss, _ = m.forward_loss(params, dp)
    assert np.isfinite(float(loss))


def test_split_train_val(tmp_path):
    import cv2
    from enhax.constants import DATAMODULES
    rng = np.random.default_rng(0)
    d = tmp_path / "lol_v1" / "train" / "image"
    d.mkdir(parents=True)
    for i in range(10):
        cv2.imwrite(str(d / f"{i}.png"),
                    (rng.uniform(0, 1, (8, 8, 3)) * 255).astype(np.uint8))
    dm = DATAMODULES.build("lol_v1", root=tmp_path, batch_size=2)
    dm.setup("train")
    dm.split_train_val(ratio=0.8)
    assert len(dm.train) == 8 and len(dm.val) == 2
    batches = list(dm.train_loader())
    assert batches[0]["image"].shape == (2, 8, 8, 3)


@pytest.mark.slow
def test_remove_anything_pipeline(rng):
    """Inpaint-Anything remove pipeline: SAM point mask -> dilate -> LaMa."""
    from enhax.infer.inpaint_anything import dilate_mask, remove_anything
    img = rng.uniform(0, 1, (96, 96, 3)).astype(np.float32)
    out = remove_anything(
        img, (48.0, 48.0), dilate_kernel_size=7,
        sam_kwargs=dict(dim=32, depth=2),
        lama_kwargs=dict(features=8, n_blocks=1))
    assert out["inpainted"].shape == img.shape
    assert out["mask"].shape == (96, 96)
    assert np.isfinite(out["inpainted"]).all()
    # untouched outside the mask
    outside = ~out["mask"].astype(bool)
    np.testing.assert_allclose(out["inpainted"][outside], img[outside],
                               atol=1e-6)
    # dilation golden vs cv2 semantics
    m = np.zeros((9, 9), np.uint8)
    m[4, 4] = 1
    d = dilate_mask(m, 3)
    assert d.sum() == 9 and d[3:6, 3:6].all()


def test_crop_for_filling_roundtrip(rng):
    """crop pre/post match the reference mask_processing.py geometry:
    the filled crop lands back exactly on the mask pixels."""
    from enhax.infer.inpaint_anything import (crop_for_filling_post,
                                              crop_for_filling_pre)
    img = rng.uniform(0, 1, (96, 80, 3)).astype(np.float32)
    mask = np.zeros((96, 80), bool)
    mask[30:50, 20:44] = True
    crop, mcrop = crop_for_filling_pre(img, mask, crop_size=64)
    assert crop.shape == (64, 64, 3) and mcrop.shape == (64, 64)
    assert mcrop.sum() == mask.sum()  # bbox fits: no rescale
    out = crop_for_filling_post(img, mask, np.ones_like(crop), crop_size=64)
    np.testing.assert_allclose(out[mask], 1.0, atol=1e-6)
    np.testing.assert_allclose(out[~mask], img[~mask], atol=1e-6)
    # oversize-bbox branch: mask wider than the crop -> shrink path
    bigmask = np.zeros((96, 80), bool)
    bigmask[10:90, 4:76] = True
    crop2, mcrop2 = crop_for_filling_pre(img, bigmask, crop_size=64)
    assert crop2.shape == (64, 64, 3) and mcrop2.any()


def test_resize_and_pad_roundtrip(rng):
    from enhax.infer.inpaint_anything import recover_size, resize_and_pad
    # smooth image: the down/up bilinear hops preserve low frequencies
    yy, xx = np.mgrid[0:60, 0:96].astype(np.float32)
    img = np.stack([yy / 60, xx / 96, (yy + xx) / 156], axis=-1)
    mask = np.zeros((60, 96), np.float32)
    mask[20:40, 30:60] = 1.0
    ip, mp, pads = resize_and_pad(img, mask, target_size=64)
    assert ip.shape == (64, 64, 3) and mp.shape == (64, 64)
    tp, bp, lp, rp = pads
    assert tp + bp == 64 - 40 and lp + rp == 0
    ir, mr = recover_size(ip, mp, (60, 96), pads)
    assert ir.shape == (60, 96, 3)
    np.testing.assert_allclose(ir, img, atol=0.06)  # two bilinear hops


@pytest.mark.slow
def test_fill_and_replace_anything_pipelines(rng):
    """fill/replace (fill_anything.py / replace_img_with_sd) at random
    init with tiny SD + SAM configs: geometry + compositing contracts."""
    from enhax.infer.inpaint_anything import fill_anything, replace_anything
    img = rng.uniform(0, 1, (96, 80, 3)).astype(np.float32)
    sd_kwargs = dict(model_channels=32, context_dim=32, vae_ch=32,
                     num_heads=2, steps=2)
    out = fill_anything(
        img, (40.0, 48.0), dilate_kernel_size=5, crop_size=64,
        sam_kwargs=dict(dim=32, depth=2), sd_kwargs=sd_kwargs)
    assert out["filled"].shape == img.shape
    assert np.isfinite(out["filled"]).all()
    outside = ~out["mask"].astype(bool)
    np.testing.assert_allclose(out["filled"][outside], img[outside],
                               atol=1e-6)
    rep = replace_anything(
        img, (40.0, 48.0), target_size=64,
        sam_kwargs=dict(dim=32, depth=2), sd_kwargs=sd_kwargs)
    assert rep["replaced"].shape == img.shape
    assert np.isfinite(rep["replaced"]).all()


@pytest.mark.slow
def test_sd_inpaint_model(rng):
    """The 9-channel SD-inpainting backbone: shapes, finiteness, and the
    paste contract (unmasked pixels untouched)."""
    import jax
    import jax.numpy as jnp
    from enhax.models.base import build_model
    m = build_model("sd_inpaint", model_channels=32, context_dim=32,
                    vae_ch=32, num_heads=2, steps=2)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    mask = jnp.zeros((1, 64, 64, 1), jnp.float32).at[:, 16:48, 16:48].set(1.0)
    dp = {"image": x, "mask": mask}
    v = m.init(jax.random.PRNGKey(0), dp)
    out = m.apply(v, dp)
    assert out["enhanced"].shape == (1, 64, 64, 3)
    assert out["latent"].shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out["enhanced"])).all()
    got = np.asarray(out["enhanced"])[0]
    ref = np.asarray(x)[0]
    keep = np.asarray(mask)[0, :, :, 0] < 0.5
    np.testing.assert_allclose(got[keep], ref[keep], atol=1e-6)


def test_ffmpeg_writer_pipes_rawvideo(tmp_path, monkeypatch):
    """VideoWriterFFmpeg feeds rgb24 rawvideo over stdin with the reference's
    arg contract (core/video/io.py:317). Runs against a stub ffmpeg binary
    so the pipe mechanics are tested without the real encoder."""
    import os
    import stat
    import numpy as np
    from enhax.ops.video import VideoWriterFFmpeg, is_ffmpeg_available

    stub = tmp_path / "bin" / "ffmpeg"
    stub.parent.mkdir()
    # writes argv to <out>.args and byte count of stdin to <out>
    stub.write_text(
        "#!/bin/sh\n"
        'out=""\n'
        'for a in "$@"; do out="$a"; done\n'
        'printf "%s\\n" "$@" > "$out.args"\n'
        "wc -c > \"$out\"\n")
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{stub.parent}:{os.environ['PATH']}")
    assert is_ffmpeg_available()

    out = tmp_path / "vid.mp4"
    w = VideoWriterFFmpeg(out, fps=24.0)
    frames = np.random.default_rng(0).uniform(0, 1, (3, 8, 12, 3)).astype(np.float32)
    w.write_batch(frames)
    w.close()
    n_bytes = int(out.read_text().split()[0])
    assert n_bytes == 3 * 8 * 12 * 3  # rgb24 rawvideo payload
    args = (tmp_path / "vid.mp4.args").read_text().split("\n")
    assert "rawvideo" in args and "rgb24" in args and "12x8" in args
    assert "yuv420p" in args


def test_ffmpeg_writer_real_roundtrip(tmp_path):
    """Full encode/decode roundtrip when a real ffmpeg binary exists."""
    import shutil
    import numpy as np
    import pytest as _pytest
    from enhax.ops.video import VideoReaderCV, VideoWriterFFmpeg
    if shutil.which("ffmpeg") is None:
        _pytest.skip("ffmpeg binary not installed")
    out = tmp_path / "vid.mp4"
    w = VideoWriterFFmpeg(out, fps=10.0)
    frames = np.stack([np.full((32, 48, 3), v, np.float32)
                       for v in (0.1, 0.5, 0.9)])
    w.write_batch(frames)
    w.close()
    r = VideoReaderCV(out)
    got = list(r)
    assert len(got) == 3
    assert abs(float(got[1].mean()) - 0.5) < 0.05


def test_ffmpeg_writer_pads_odd_dims(tmp_path, monkeypatch):
    """yuv420p needs even dims; odd frames get a 1-px pad filter instead of
    a silent encoder death (VideoWriterCV handled odd sizes, and auto mode
    now prefers ffmpeg — r3 review finding)."""
    import os
    import stat

    import numpy as np

    from enhax.ops.video import VideoWriterFFmpeg

    stub = tmp_path / "bin" / "ffmpeg"
    stub.parent.mkdir()
    stub.write_text(
        "#!/bin/sh\n"
        'out=""\n'
        'for a in "$@"; do out="$a"; done\n'
        'printf "%s\\n" "$@" > "$out.args"\n'
        "cat > /dev/null\n")
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{stub.parent}:{os.environ['PATH']}")

    out = tmp_path / "odd.mp4"
    w = VideoWriterFFmpeg(out, fps=10.0)
    w.write(np.zeros((31, 49, 3), np.float32))
    w.close()
    args = (tmp_path / "odd.mp4.args").read_text()
    assert "pad=ceil(iw/2)*2:ceil(ih/2)*2" in args


def test_ffmpeg_writer_surfaces_encoder_failure(tmp_path, monkeypatch):
    """A dying encoder raises RuntimeError with ffmpeg's stderr, not a bare
    BrokenPipeError or a silent zero-length file (r3 review finding)."""
    import os
    import stat

    import numpy as np
    import pytest as _pytest

    from enhax.ops.video import VideoWriterFFmpeg

    stub = tmp_path / "bin" / "ffmpeg"
    stub.parent.mkdir()
    stub.write_text(
        "#!/bin/sh\n"
        "echo 'boom: width not divisible by 2' >&2\n"
        "exit 1\n")
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{stub.parent}:{os.environ['PATH']}")

    w = VideoWriterFFmpeg(tmp_path / "bad.mp4", fps=10.0)
    with _pytest.raises(RuntimeError, match="boom"):
        # the stub exits immediately; the failure surfaces on the first
        # write that hits the closed pipe or at close()
        for _ in range(50):
            w.write(np.zeros((8, 8, 3), np.float32))
        w.close()
