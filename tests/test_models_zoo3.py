"""Classification/SR/segment/depth/tracking wave tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import enhax
from enhax.models.base import build_model


@pytest.fixture
def img(rng):
    return jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))


@pytest.mark.parametrize("name", ["resnet18", "mobilenet_v2", "alexnet",
                                  "squeezenet1_0", "convnext_tiny",
                                  "shufflenet_v2_x1_0", "efficientnet_b0",
                                  "regnet_x_400mf", "regnet_y_400mf",
                                  "squeezenet1_1", "shufflenet_v2_x0_5",
                                  "mnasnet0_5", "efficientnet_v2_s"])
def test_classifier_forward(name, img):
    m = build_model(name, num_classes=10)
    dp = {"image": img}
    params = m.init(jax.random.PRNGKey(0), dp)
    out = m.apply(params, dp)
    assert out["logits"].shape == (1, 10)
    assert np.all(np.isfinite(np.asarray(out["logits"])))


def test_classifier_loss(img):
    m = build_model("resnet18", num_classes=10)
    dp = {"image": img, "class_id": jnp.asarray([3])}
    params = m.init(jax.random.PRNGKey(0), dp)
    loss, _ = m.forward_loss(params, dp)
    assert np.isfinite(float(loss))


def test_vit_forward(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    m = build_model("vit_b_32", num_classes=5)
    params = m.init(jax.random.PRNGKey(0), {"image": x})
    out = m.apply(params, {"image": x})
    assert out["logits"].shape == (1, 5)


def test_swin_forward(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))
    m = build_model("swin_t", num_classes=5, window=4)
    params = m.init(jax.random.PRNGKey(0), {"image": x})
    out = m.apply(params, {"image": x})
    assert out["logits"].shape == (1, 5)


def test_classify_zoo_size():
    assert len(enhax.MODELS.models_for_task(enhax.Task.CLASSIFY)) >= 30


def test_srno(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    m = build_model("srno", features=16, scale=2)
    params = m.init(jax.random.PRNGKey(0), {"image": x})
    out = m.apply(params, {"image": x})
    assert out["enhanced"].shape == (1, 32, 32, 3)


def test_diinn(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    m = build_model("diinn", g0=16, num_blocks=2, num_convs=2,
                    growth=16, hidden=32, scale=2)
    params = m.init(jax.random.PRNGKey(0), {"image": x})
    out = m.apply(params, {"image": x})
    assert out["enhanced"].shape == (1, 32, 32, 3)


def test_unet_segmentation(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    m = build_model("unet", num_classes=4, base=8)
    dp = {"image": x, "segmentation": jnp.zeros((1, 32, 32, 1), jnp.int32)}
    params = m.init(jax.random.PRNGKey(0), {"image": x})
    out = m.apply(params, {"image": x})
    assert out["logits"].shape == (1, 32, 32, 4)
    assert out["mask"].shape == (1, 32, 32)
    loss, _ = m.forward_loss(params, dp)
    assert np.isfinite(float(loss))


def test_deeplabv3(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    m = build_model("deeplabv3_resnet50", num_classes=4)
    params = m.init(jax.random.PRNGKey(0), {"image": x})
    out = m.apply(params, {"image": x})
    assert out["logits"].shape == (1, 64, 64, 4)


def test_depth_anything_arch(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 56, 56, 3)).astype(np.float32))
    m = build_model("depth_anything_v2_vits", dim=64, depth=12, heads=4)
    params = m.init(jax.random.PRNGKey(0), {"image": x})
    out = m.apply(params, {"image": x})
    assert out["depth"].shape == (1, 56, 56, 1)
    assert float(jnp.min(out["depth"])) >= 0


# --- tracking ---------------------------------------------------------------

def test_sort_tracks_moving_box():
    from enhax.track import SORT
    tracker = SORT(max_age=3, min_hits=2)
    ids = []
    for t in range(8):
        det = np.array([[10 + 4 * t, 10, 40 + 4 * t, 50, 0.9]])
        out = tracker.update(det)
        if len(out):
            ids.append(int(out[0, 4]))
    assert len(ids) >= 5
    assert len(set(ids)) == 1  # one stable identity


def test_sort_two_objects_keep_ids():
    from enhax.track import SORT
    tracker = SORT(max_age=3, min_hits=1)
    for t in range(6):
        dets = np.array([[10 + 3 * t, 10, 30 + 3 * t, 40, 0.9],
                         [100, 100 + 3 * t, 130, 140 + 3 * t, 0.8]])
        out = tracker.update(dets)
    assert out.shape[0] == 2
    assert len(set(out[:, 4].astype(int))) == 2


def test_ocsort_reacquires_after_occlusion():
    from enhax.track import OCSORT
    tracker = OCSORT(max_age=10, min_hits=1)
    first_id = None
    for t in range(12):
        if 4 <= t < 7:
            dets = np.empty((0, 5))  # occluded
        else:
            dets = np.array([[10 + 5 * t, 10, 40 + 5 * t, 50, 0.9]])
        out = tracker.update(dets)
        if len(out) and first_id is None:
            first_id = int(out[0, 4])
    assert len(out) == 1
    assert int(out[0, 4]) == first_id  # identity preserved through occlusion


def test_sam_lite_promptable_segmentation(rng):
    """SAM-lite: point prompts -> multi-mask output + IoU preds + CCL postproc."""
    from enhax.models.segment.sam import sam_postprocess
    m = build_model("sam_lite", dim=64, depth=2)
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    points = jnp.asarray([[[0.5, 0.5], [0.2, 0.8]]], jnp.float32)
    labels = jnp.asarray([[1, 0]], jnp.int32)
    dp = {"image": img, "points": points, "labels": labels}
    params = m.init(jax.random.PRNGKey(0), dp)
    out = m.apply(params, dp)
    assert out["masks"].shape == (1, 3, 64, 64)
    assert out["iou_predictions"].shape == (1, 3)
    clean = sam_postprocess(np.asarray(out["masks"][0, 0]), area_thresh=4)
    assert clean.shape == (64, 64) and clean.dtype == bool


def test_yolo_lite_detect_and_decode(rng):
    from enhax.models.detect.yolo import decode_yolo
    m = build_model("yolo_lite", num_classes=3, width=8)
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), {"image": img})
    out = m.apply(params, {"image": img})
    assert out["cls_p3"].shape == (1, 8, 8, 3)
    assert out["box_p3"].shape == (1, 8, 8, 32)  # 4 * reg_max
    dets = decode_yolo(out, num_classes=3, score_thresh=0.0, max_dets=10)
    assert dets.shape[1] == 6 and len(dets) <= 10


def test_regnet_full_size_table():
    """All 15 torchvision RegNet variants are registered and buildable."""
    from enhax.constants import MODELS
    names = sorted(n for n in MODELS if n.startswith("regnet"))
    assert len(names) == 15
    assert "regnet_y_128gf" in names and "regnet_x_32gf" in names


def test_regnet_y_has_se(img):
    """Y family carries squeeze-excite params; X family does not."""
    my = build_model("regnet_y_400mf", num_classes=10)
    mx = build_model("regnet_x_400mf", num_classes=10)
    py = my.init(jax.random.PRNGKey(0), {"image": img})
    px = mx.init(jax.random.PRNGKey(0), {"image": img})
    flat_y = jax.tree_util.tree_flatten_with_path(py)[0]
    flat_x = jax.tree_util.tree_flatten_with_path(px)[0]
    has = lambda flat: any("_se1" in "/".join(map(str, p)) for p, _ in flat)
    assert has(flat_y) and not has(flat_x)


@pytest.mark.slow
def test_yolov8_param_counts_match_published():
    """Published table (models/v8/yolov8.yaml:8-9): gradient counts; the
    +16 'parameters' delta is ultralytics' frozen DFL arange buffer, which
    enhax computes functionally."""
    import jax
    from enhax.models.base import build_model
    for scale, published_grads in (("n", 3157184), ("s", 11166544)):
        m = build_model(f"yolov8{scale}")
        v = m.init(jax.random.PRNGKey(0),
                   {"image": np.zeros((1, 64, 64, 3), np.float32)})
        cnt = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
        assert cnt == published_grads, (scale, cnt, published_grads)


@pytest.mark.slow
def test_yolov8_detect_track_pipeline():
    """yolov8n forward -> decode -> SORT across 2 frames (pipeline wiring)."""
    import jax
    from enhax.models.base import build_model
    from enhax.models.detect.yolov8 import decode_yolov8
    from enhax.track.sort import SORT

    m = build_model("yolov8n")
    rng_l = np.random.default_rng(0)
    x = rng_l.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), {"image": x})
    tracker = SORT()
    for _ in range(2):
        out = m.apply(v, {"image": x})
        dets = decode_yolov8(out, score_thresh=0.0, max_dets=5)
        tracks = tracker.update(dets[:, :5])
        assert tracks.shape[1] >= 5


@pytest.mark.slow
def test_sam2_lite_video_propagation():
    """Prompt frame 0, propagate a moving square across 3 frames via the
    scanned memory bank; masks must stay finite and frame-shaped, and the
    CCL post-proc must clean them."""
    import jax
    from enhax.models.base import build_model
    from enhax.models.segment.sam import sam_postprocess
    from enhax.models.segment.sam2 import (init_video_variables,
                                           make_video_propagator)

    m = build_model("sam2_lite", dim=64, mem_dim=32, depth=1, num_maskmem=2)
    rng_l = np.random.default_rng(0)
    frames = np.zeros((3, 64, 64, 3), np.float32)
    for t in range(3):
        frames[t, 20 + 4 * t:40 + 4 * t, 20:40, :] = 1.0
    frames += rng_l.uniform(0, 0.05, frames.shape).astype(np.float32)
    points = np.array([[[0.45, 0.45]]], np.float32)  # normalized (y, x)
    labels = np.array([[1]], np.int32)

    variables = init_video_variables(m, jax.random.PRNGKey(0),
                                     jnp.asarray(frames[0:1]),
                                     jnp.asarray(points), jnp.asarray(labels))
    prop = jax.jit(make_video_propagator(m))
    masks = prop(variables, jnp.asarray(frames), jnp.asarray(points),
                 jnp.asarray(labels))
    assert masks.shape == (3, 64, 64)
    assert np.isfinite(np.asarray(masks)).all()
    cleaned = sam_postprocess(np.asarray(masks[2]), area_thresh=10)
    assert cleaned.shape == (64, 64)


@pytest.mark.slow
def test_depth_pro_full_arch(rng):
    """Faithful Depth Pro: pyramid encoder + DPT decoder + FOV head."""
    import jax
    import jax.numpy as jnp
    m = build_model("depth_pro", vit_dim=32, vit_depth=2, vit_heads=2,
                    backbone_size=64, patch=8, decoder_features=16,
                    dims_encoder=(16, 16, 32, 32), hook_ids=(0, 1))
    x = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), {"image": x})
    out = m.apply(params, {"image": x})
    assert out["depth"].shape == (1, 128, 128, 1)
    assert "fov_deg" in out
    assert np.isfinite(np.asarray(out["depth"])).all()


@pytest.mark.slow
def test_mobile_sam_promptable(rng):
    """MobileSAM: TinyViT encoder + promptable decoder end to end."""
    import jax
    import jax.numpy as jnp
    m = build_model("mobile_sam", embed_dims=(16, 32, 40, 80),
                    heads=(2, 4, 5, 10), dim=32)
    x = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))
    pts = jnp.asarray([[[64.0, 64.0]]])
    lbl = jnp.asarray([[1]])
    dp = {"image": x, "points": pts, "labels": lbl}
    params = m.init(jax.random.PRNGKey(0), dp)
    out = m.apply(params, dp)
    assert out["masks"].shape[-2:] == (128, 128)
    assert np.isfinite(np.asarray(out["masks"])).all()


def test_yolov8_decode_class_aware_nms():
    """Overlapping detections of DIFFERENT classes both survive NMS
    (ultralytics' class-offset default); same-class overlaps suppress;
    agnostic=True restores class-blind suppression (r3 review)."""
    import numpy as np

    from enhax.models.detect.yolov8 import decode_yolov8

    def logit(p):
        return float(np.log(p / (1 - p)))

    nc = 3
    # anchors: two near-identical boxes, classes 0 and 1; one same-class
    # duplicate of the first at lower score
    rows = []
    for cx, cy, w, h, cls, p in ((50, 50, 20, 20, 0, 0.9),
                                 (51, 50, 20, 20, 1, 0.8),
                                 (50, 51, 20, 20, 0, 0.6)):
        cls_logits = [logit(0.01)] * nc
        cls_logits[cls] = logit(p)
        rows.append([cx, cy, w, h] + cls_logits)
    preds = np.asarray([rows], np.float32)

    dets = decode_yolov8({"preds": preds}, score_thresh=0.25, iou_thresh=0.5)
    assert dets.shape[0] == 2                      # one per class
    assert sorted(dets[:, 5].astype(int).tolist()) == [0, 1]

    dets_ag = decode_yolov8({"preds": preds}, score_thresh=0.25,
                            iou_thresh=0.5, agnostic=True)
    assert dets_ag.shape[0] == 1                   # class-blind keeps best
