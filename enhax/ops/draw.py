"""Drawing utilities: bboxes, heatmaps, trajectories (host-side numpy/cv2).

Rebuild of reference ``core/image/draw.py`` (189 LoC): render detection
boxes with labels, blend heatmaps, draw tracked trajectories. Used by the
predict CLI's debug dumps and the tracking demos.
"""

from __future__ import annotations

import numpy as np


def _to_u8(image: np.ndarray) -> np.ndarray:
    img = np.asarray(image)
    if img.dtype in (np.float32, np.float64):
        img = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    return np.ascontiguousarray(img)


def draw_bboxes(image, bboxes, labels=None, color=(0, 255, 0), thickness=2):
    """Draw xyxy boxes (+optional labels) on an RGB image. Returns uint8."""
    import cv2
    img = _to_u8(image)
    for i, box in enumerate(np.asarray(bboxes).reshape(-1, bboxes.shape[-1] if hasattr(bboxes, 'shape') else 4)):
        x1, y1, x2, y2 = [int(v) for v in box[:4]]
        cv2.rectangle(img, (x1, y1), (x2, y2), color, thickness)
        if labels is not None and i < len(labels):
            cv2.putText(img, str(labels[i]), (x1, max(y1 - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.45, color, 1, cv2.LINE_AA)
    return img


def draw_heatmap(image, heatmap, alpha: float = 0.5):
    """Overlay a (H, W) or (H, W, 1) heatmap with a colormap."""
    import cv2
    img = _to_u8(image)
    hm = np.asarray(heatmap)
    if hm.ndim == 3:
        hm = hm[..., 0]
    hm = (np.clip(hm, 0, 1) * 255).astype(np.uint8)
    if hm.shape != img.shape[:2]:
        hm = cv2.resize(hm, (img.shape[1], img.shape[0]))
    colored = cv2.applyColorMap(hm, cv2.COLORMAP_JET)
    colored = cv2.cvtColor(colored, cv2.COLOR_BGR2RGB)
    return cv2.addWeighted(img, 1 - alpha, colored, alpha, 0)


def draw_trajectories(image, trajectories: dict, colors=None, thickness=2):
    """Draw per-track center trajectories: {track_id: [(x, y), ...]}."""
    import cv2
    img = _to_u8(image)
    palette = colors or [(255, 64, 64), (64, 255, 64), (64, 64, 255),
                         (255, 255, 64), (255, 64, 255), (64, 255, 255)]
    for tid, pts in trajectories.items():
        c = palette[int(tid) % len(palette)]
        pts = np.asarray(pts, np.int32)
        for a, b in zip(pts[:-1], pts[1:]):
            cv2.line(img, tuple(a), tuple(b), c, thickness)
        if len(pts):
            cv2.circle(img, tuple(pts[-1]), 4, c, -1)
    return img


# Named color palette (reference globals.py:102 RGB enum, compact subset of
# the 138-color table; extend as needed). Values are RGB uint8 triples.
PALETTE = {
    "red": (255, 0, 0), "green": (0, 128, 0), "blue": (0, 0, 255),
    "yellow": (255, 255, 0), "cyan": (0, 255, 255), "magenta": (255, 0, 255),
    "orange": (255, 165, 0), "purple": (128, 0, 128), "pink": (255, 192, 203),
    "lime": (0, 255, 0), "teal": (0, 128, 128), "navy": (0, 0, 128),
    "maroon": (128, 0, 0), "olive": (128, 128, 0), "brown": (165, 42, 42),
    "coral": (255, 127, 80), "gold": (255, 215, 0), "indigo": (75, 0, 130),
    "turquoise": (64, 224, 208), "violet": (238, 130, 238),
    "white": (255, 255, 255), "black": (0, 0, 0), "gray": (128, 128, 128),
    "silver": (192, 192, 192), "crimson": (220, 20, 60),
    "chocolate": (210, 105, 30), "salmon": (250, 128, 114),
    "khaki": (240, 230, 140), "orchid": (218, 112, 214),
    "sky_blue": (135, 206, 235), "sea_green": (46, 139, 87),
    "slate_gray": (112, 128, 144), "steel_blue": (70, 130, 180),
    "tomato": (255, 99, 71), "wheat": (245, 222, 179),
}


def color_for_id(i: int) -> tuple:
    """Deterministic distinct color for a track/class id."""
    keys = [k for k in PALETTE if k not in ("white", "black")]
    return PALETTE[keys[int(i) % len(keys)]]
