"""CLI entry-point tests (in-process; the full subprocess path is exercised
by the project verify drives)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    import cv2
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(d / f"{i}.png"),
                    (rng.uniform(0, 0.3, (20, 24, 3)) * 255).astype(np.uint8))
    return d


def test_parse_train_args_flags_beat_config(tmp_path):
    from enhax.cli.train import parse_train_args
    cfg = tmp_path / "cfg.py"
    cfg.write_text("model='zero_dce_re'\ndata='lol_v1'\nepochs=50\n")
    args = parse_train_args(["--config", str(cfg), "--epochs", "3"])
    assert args["model"] == "zero_dce_re"
    assert args["epochs"] == 3  # flag wins


def test_predict_cli_inprocess(image_dir, tmp_path):
    from enhax.cli.predict import predict
    out = predict({"model": "zero_dce_re", "data": str(image_dir),
                   "save_dir": str(tmp_path / "out"), "save_image": True})
    outs = list(out.glob("*.png"))
    assert len(outs) == 3


def test_metric_cli_inprocess(image_dir):
    from enhax.cli.metric import measure_metric
    res = measure_metric({"input": str(image_dir), "target": str(image_dir),
                          "metric": ["psnr", "ssim", "brightness"]})
    assert res["psnr"] > 60  # identical dirs
    assert abs(res["ssim"] - 1.0) < 1e-4


def test_metric_unknown_metric(image_dir):
    from enhax.cli.metric import measure_metric
    with pytest.raises(SystemExit, match="unknown metric"):
        measure_metric({"input": str(image_dir), "metric": ["niqe_magic"]})


def test_metric_cli_longform_aliases(image_dir):
    """Torchmetrics long-form names (the reference's registered spelling,
    nn/metric/image.py:63-83) resolve through the CLI to the same values."""
    from enhax.cli.metric import measure_metric
    res = measure_metric({"input": str(image_dir), "target": str(image_dir),
                          "metric": ["peak_signal_noise_ratio",
                                     "structural_similarity_index_measure"]})
    assert res["psnr"] > 60
    assert abs(res["ssim"] - 1.0) < 1e-4


def test_plot_cli_inprocess(image_dir, tmp_path):
    from enhax.cli.plot import plot
    out = plot({"input": str(image_dir), "results": [str(image_dir)],
                "target": str(image_dir), "save_dir": str(tmp_path / "plots"),
                "label": True})
    assert len(list(out.glob("*.png"))) == 3


def test_predict_iter_batches(image_dir):
    import jax
    from enhax.data.dataset import ImageLoader
    from enhax.infer import Predictor
    from enhax.models.base import build_model
    m = build_model("zero_dce_re", num_channels=8)
    pred = Predictor(m)
    loader = ImageLoader(image_dir)
    results = list(pred.predict_iter(loader, batch_size=2))
    assert len(results) == 2  # 2 + 1
    out0, metas0 = results[0]
    assert out0["enhanced"].shape[0] == 2
    assert len(metas0) == 2 and "name" in metas0[0]


def test_plot_cli_diff_and_zoom(image_dir, tmp_path):
    from enhax.cli.plot import plot
    out = plot({"input": str(image_dir), "results": [str(image_dir)],
                "target": str(image_dir), "save_dir": str(tmp_path / "pd"),
                "label": True, "mode": "diff", "ref": "GT", "num_cols": 2,
                "zoom": [0.25, 0.25, 0.3, 0.3]})
    files = list(out.glob("*-diff.png"))
    assert len(files) == 3


def test_metric_cli_segment_miou(tmp_path):
    """--task segment: confusion-matrix mIoU/mPA on synthetic label maps
    matches a hand-computed golden (metric_darkcityscapes.py:21-75)."""
    import cv2
    import numpy as np
    from enhax.cli.metric import measure_segment_metric

    pred_dir = tmp_path / "pred"
    gt_dir = tmp_path / "gt"
    pred_dir.mkdir()
    gt_dir.mkdir()
    # 4x4, 3 classes. pred: left half class 0, right half class 1, one px 2
    pred = np.zeros((4, 4), np.uint8)
    pred[:, 2:] = 1
    pred[3, 3] = 2
    gt = np.zeros((4, 4), np.uint8)
    gt[:, 2:] = 1
    cv2.imwrite(str(pred_dir / "a.png"), pred)
    cv2.imwrite(str(gt_dir / "a.png"), gt)

    out = measure_segment_metric({"input": str(pred_dir),
                                  "target": str(gt_dir),
                                  "seg_classes": 3,
                                  "metric": ["miou", "mpa", "pa"]})
    # golden: class0 IoU 8/8=1, class1 inter 7 union 8 -> 7/8, class2 0/1=0
    assert abs(out["miou"] - np.nanmean([1.0, 7 / 8, 0.0])) < 1e-9
    # pixel accuracy: 15/16 correct
    assert abs(out["pa"] - 15 / 16) < 1e-9
    # mPA (precision per predicted class): c0 8/8, c1 7/7, c2 0/1
    assert abs(out["mpa"] - np.nanmean([1.0, 1.0, 0.0])) < 1e-9


def test_metric_cli_segment_binarize(tmp_path):
    """--seg-binarize reproduces the darkcityscapes color_to_gray flow
    (grayscale threshold -> binary maps, 2-class confusion matrix)."""
    import cv2
    import numpy as np
    from enhax.cli.metric import measure_segment_metric

    pred_dir = tmp_path / "pred"
    gt_dir = tmp_path / "gt"
    pred_dir.mkdir()
    gt_dir.mkdir()
    pred = np.zeros((8, 8, 3), np.uint8)
    pred[:4] = 200   # bright -> class 1
    gt = np.zeros((8, 8, 3), np.uint8)
    gt[:4] = 200
    gt[4, :] = 180   # one extra bright row in GT only
    cv2.imwrite(str(pred_dir / "x_leftImg8bit.png"), pred)
    cv2.imwrite(str(gt_dir / "x_gtFine_color.png"), gt)
    out = measure_segment_metric({"input": str(pred_dir),
                                  "target": str(gt_dir),
                                  "seg_binarize": 125 / 255.0,
                                  "metric": ["miou"]})
    # class1: inter 32, union 40; class0: inter 24, union 32
    golden = np.mean([24 / 32, 32 / 40])
    assert abs(out["miou"] - golden) < 1e-9


def test_copy_image_cli(tmp_path):
    """copy_image gathers one image's predictions across model dirs into
    output/<stem>/<model>.<ext>, resized short-side/divisible-by
    (reference project/runml/copy_image.py:52-70 layout)."""
    import cv2

    from enhax.cli.copy_image import copy_image, main

    rng = np.random.default_rng(0)
    pred = tmp_path / "predict"
    for model in ("zero_dce_re", "hinet_re"):
        d = pred / "llie" / model / "lol_v1"
        d.mkdir(parents=True)
        cv2.imwrite(str(d / "0001.png"),
                    (rng.uniform(0, 1, (40, 64, 3)) * 255).astype(np.uint8))

    out = copy_image({"input_dir": str(pred), "image_file": "lol_v1/0001.png",
                      "imgsz": 32, "divisible_by": 16, "side": "short",
                      "resize": True})
    got = sorted(p.name for p in out.glob("*.png"))
    assert got == ["hinet_re.png", "zero_dce_re.png"]
    img = cv2.imread(str(out / "hinet_re.png"))
    # reference arithmetic: base snapped to divisible_by, the scaled side
    # NOT re-snapped (transform.py:162-177): 40x64 @ short 32 -> 32x51
    assert img.shape[:2] == (32, 51)

    # vert/horz fall through upstream to an exact square resize
    out2 = copy_image({"input_dir": str(pred), "image_file": "lol_v1/0001",
                       "output_dir": str(tmp_path / "sq"), "imgsz": 32,
                       "divisible_by": 16, "side": "vert", "resize": True})
    assert cv2.imread(str(out2 / "hinet_re.png")).shape[:2] == (32, 32)

    # argv surface, explicit output dir, no resize keeps original size
    main(["--input-dir", str(pred), "--image-file", "lol_v1/0001",
          "--output-dir", str(tmp_path / "paper")])
    img2 = cv2.imread(str(tmp_path / "paper" / "lol_v1" / "0001"
                          / "zero_dce_re.png"))
    assert img2.shape == (40, 64, 3)


def test_shipped_configs_load_and_build():
    """Every configs/*.py (the BASELINE training recipes) loads through the
    config loader, names a registered model+datamodule, and its model_cfg
    actually builds (reference: project/runml/config/*.py resolution,
    utils/config.py)."""
    from pathlib import Path as _P

    from enhax.constants import DATAMODULES, MODELS
    from enhax.utils.config import load_config

    cfg_dir = _P(__file__).parent.parent / "configs"
    files = sorted(cfg_dir.glob("*.py"))
    assert len(files) >= 50  # VERDICT r3 item 5 done-condition
    for f in files:
        cfg = load_config(f)
        assert cfg.get("model") in MODELS, f
        # instance/zero-shot recipes ship data=None (supplied via --data at
        # predict time — upstream leaves data_name empty for those)
        if cfg.get("data") is not None:
            assert cfg["data"] in DATAMODULES, f
        model = MODELS.build(cfg["model"], **(cfg.get("model_cfg") or {}))
        assert model.name, f
        opt_cfg = cfg.get("optimizer_cfg") or {}
        opt = opt_cfg.get("optimizer", {})
        if opt:
            from enhax.constants import OPTIMIZERS
            assert opt.get("name") in OPTIMIZERS, f
            # the full optimizer + scheduler chain must build and the LR
            # schedule must evaluate (catches bad scheduler kwargs)
            from enhax.nn.optim import build_optimizer, build_schedule
            tx = build_optimizer(opt_cfg)
            assert tx is not None, f
            sched_spec = opt_cfg.get("lr_scheduler")
            if isinstance(sched_spec, dict) and "scheduler" in sched_spec:
                sched = build_schedule(opt["lr"], sched_spec["scheduler"])
                assert float(sched(0)) > 0, f


def test_metric_cli_niqe_official_params(tmp_path):
    """--metric niqe with the reference's official niqe_pris_params.npz
    routes through the official scoring pipeline end to end (needs
    >=96px images for the NIQE block size)."""
    import os

    import cv2

    from enhax.cli.metric import measure_metric

    npz = ("/root/reference/src/mon_extra/vision/enhance/multitask/"
           "restormer/basicsr/metrics/niqe_pris_params.npz")
    if not os.path.isfile(npz):
        pytest.skip("reference tree not present")
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        base = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
        img = cv2.resize(base, (128, 128), interpolation=cv2.INTER_CUBIC)
        img += 0.05 * rng.standard_normal((128, 128, 3)).astype(np.float32)
        cv2.imwrite(str(d / f"{i}.png"),
                    (np.clip(img, 0, 1) * 255).astype(np.uint8))
    res = measure_metric({"input": str(d),
                          "metric": ["niqe"], "niqe_params": npz})
    assert np.isfinite(res["niqe"]) and res["niqe"] > 0


def test_wizard_full_prompt_chain_predict(image_dir, tmp_path):
    """Drive the full wizard prompt chain (task -> mode -> arch -> model ->
    config -> weights -> save name/dir -> device -> predict flags ->
    verbosity; reference main.py:255-444) with scripted answers through to
    a real predict run."""
    from enhax.cli.main import run_wizard

    answers = iter([
        "llie",            # task
        "predict",         # mode
        "zero_dce",        # architecture
        "zero_dce_re",     # model
        "",                # config (none)
        "",                # weights (none)
        "",                # save name (default)
        str(tmp_path / "wiz"),  # save dir
        "auto",            # device
        str(image_dir),    # data
        "",                # image size (native)
        "no",              # resize
        "no",              # benchmark
        "yes",             # save image
        "no",              # save debug
        "no",              # data dir
        "no",              # fullpath
        "no",              # verbosity
    ])
    run_wizard(input_fn=lambda prompt: next(answers))
    import glob
    outs = glob.glob(str(tmp_path / "wiz" / "*.png"))
    assert outs  # predictions written through the real predict path


def test_wizard_instance_mode_routes_predict(image_dir, tmp_path):
    """Mode 'instance' flows through the predict pipeline (reference
    main.py:18,417-441) — the model's per-image optimization runs inside
    infer()."""
    from enhax.cli.main import run_wizard

    answers = iter([
        "llie", "instance",
        "zsn2n" if False else "zero_dce",  # architecture menu
        "zero_dce_re",
        "", "", "",                        # config, weights, save name
        str(tmp_path / "inst"),            # save dir
        "auto",
        str(image_dir),
        "", "no", "no", "yes", "no", "no", "no", "no",
    ])
    run_wizard(input_fn=lambda prompt: next(answers))
    import glob
    assert glob.glob(str(tmp_path / "inst" / "*.png"))


def test_wizard_train_mode(tmp_path):
    """Wizard train path: data/root/epochs/steps/exist-ok prompts feed the
    real train entry point."""
    import cv2
    import numpy as np

    from enhax.cli.main import run_wizard

    d = tmp_path / "data" / "lol_v1" / "train"
    (d / "image").mkdir(parents=True)
    (d / "ref").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        img = (rng.uniform(0, 1, (32, 32, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(d / "ref" / f"{i}.png"), img)
        cv2.imwrite(str(d / "image" / f"{i}.png"), (img * 0.3).astype(np.uint8))

    answers = iter([
        "llie", "train",
        "zero_dce",        # architecture
        "zero_dce_re",     # model
        "", "",            # config, weights
        "wiztrain",        # save name
        str(tmp_path / "out"),  # save dir
        "auto",            # device
        "lol_v1",          # data
        str(tmp_path / "data"),  # root
        "1",               # epochs
        "",                # steps
        "yes",             # exist ok
        "no",              # verbosity
    ])
    run_wizard(input_fn=lambda prompt: next(answers))


def test_predict_use_fullpath_and_data_dir(tmp_path, monkeypatch):
    """--use-fullpath preserves source subdirectories under save-dir
    (reference predict.py:98-103); --use-data-dir resolves a relative
    --data under $DATA_DIR (parse_args.py:213)."""
    import cv2

    from enhax.cli.predict import predict

    root = tmp_path / "datadir" / "myset"
    (root / "sub_a").mkdir(parents=True)
    (root / "sub_b").mkdir()
    rng = np.random.default_rng(0)
    for sub in ("sub_a", "sub_b"):
        cv2.imwrite(str(root / sub / "x.png"),
                    (rng.uniform(0, 0.3, (16, 16, 3)) * 255).astype(np.uint8))

    import enhax.constants as C
    monkeypatch.setattr(C, "DATA_DIR", tmp_path / "datadir")
    out = predict({"model": "zero_dce_re", "data": "myset",
                   "use_data_dir": True, "use_fullpath": True,
                   "save_dir": str(tmp_path / "out")})
    assert (out / "sub_a" / "x.png").is_file()
    assert (out / "sub_b" / "x.png").is_file()
