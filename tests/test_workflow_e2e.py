"""Full user-journey test: train CLI -> checkpoint -> predict CLI with the
trained weights -> metric CLI, on a synthetic on-disk LOL-v1-convention
dataset.

This is the reference's end-user workflow (project/runml/train.py ->
predict.py -> metric.py driven by the shell wizard, main.py:21-210) run
end to end in-process — the framework surface a user actually touches,
not just its internals.
"""

import numpy as np
import pytest

import enhax  # noqa: F401  (populate registries)


@pytest.fixture(scope="module")
def lol_root(tmp_path_factory):
    """Fake LOL-v1 layout: root/lol_v1/{train,test}/{image,ref}."""
    import cv2
    root = tmp_path_factory.mktemp("journey")
    rng = np.random.default_rng(0)
    for split, n in (("train", 6), ("test", 2)):
        for sub in ("image", "ref"):
            d = root / "lol_v1" / split / sub
            d.mkdir(parents=True)
        for i in range(n):
            dark = rng.uniform(0.0, 0.3, (48, 48, 3))
            bright = np.clip(dark * 3.0, 0, 1)
            for sub, img in (("image", dark), ("ref", bright)):
                cv2.imwrite(str(root / "lol_v1" / split / sub / f"{i:03d}.png"),
                            (img * 255).astype(np.uint8))
    return root


def test_train_predict_metric_journey(lol_root, tmp_path):
    from enhax.cli.metric import measure_metric
    from enhax.cli.predict import predict
    from enhax.cli.train import train

    run_dir = tmp_path / "run"

    # 1. train a few steps of the default zero-reference LLIE model
    state = train({
        "model": "zero_dce_re", "data": "lol_v1", "root": str(lol_root),
        "steps": 3, "batch_size": 2, "image_size": 32,
        "save_dir": str(run_dir), "seed": 0,
    })
    assert int(state.step) == 3
    ckpt = run_dir / "ckpt" / "last"
    assert ckpt.is_dir(), list(run_dir.rglob("*"))

    # 2. predict the test split with the trained checkpoint
    out_dir = predict({
        "model": "zero_dce_re",
        "data": str(lol_root / "lol_v1" / "test" / "image"),
        "weights": str(ckpt), "save_dir": str(tmp_path / "out"),
        "save_image": True,
    })
    outs = sorted(out_dir.glob("*.png"))
    assert len(outs) == 2

    # trained weights must actually be loaded: random-init output differs
    base_dir = predict({
        "model": "zero_dce_re",
        "data": str(lol_root / "lol_v1" / "test" / "image"),
        "save_dir": str(tmp_path / "out_raw"), "save_image": True,
    })
    import cv2
    a = cv2.imread(str(outs[0]))
    b = cv2.imread(str(sorted(base_dir.glob("*.png"))[0]))
    assert a.shape == b.shape == (48, 48, 3)
    assert np.abs(a.astype(np.int32) - b.astype(np.int32)).max() > 0

    # 3. score predictions against the paired refs
    res = measure_metric({
        "input": str(out_dir),
        "target": str(lol_root / "lol_v1" / "test" / "ref"),
        "metric": ["psnr", "ssim"],
    })
    assert np.isfinite(res["psnr"]) and res["psnr"] > 5
    assert 0.0 <= res["ssim"] <= 1.0


def test_train_cli_argv_roundtrip(lol_root, tmp_path):
    """The argparse surface end to end (main -> parse -> train)."""
    from enhax.cli.train import main

    main(["--model", "zero_dce_re", "--data", "lol_v1",
          "--root", str(lol_root), "--steps", "1", "--batch-size", "2",
          "--image-size", "32", "--save-dir", str(tmp_path / "run2"),
          "--seed", "1"])
    assert (tmp_path / "run2" / "ckpt" / "last").is_dir()
