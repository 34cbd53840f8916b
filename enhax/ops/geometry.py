"""Geometric image ops: pair-downsample, flips, bbox conversions.

Rebuild of reference ``core/image/geometry/`` — notably ``pair_downsample``
(transform.py:76, the ZSN2N self-supervised pair generator) and bbox format
conversions (geometry/bbox.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def pair_downsample(image):
    """Split an image into two half-res sub-images via diagonal 2x2 averaging.

    Reference ``pair_downsample`` (core/image/geometry/transform.py:76), used
    by ZSN2N: filter1 = [[0,.5],[.5,0]], filter2 = [[.5,0],[0,.5]], stride 2.
    Input (..., H, W, C) with even H/W; returns (d1, d2) at (..., H/2, W/2, C).
    """
    x = image
    h2, w2 = x.shape[-3] // 2, x.shape[-2] // 2
    x = x[..., : h2 * 2, : w2 * 2, :]
    blocks = x.reshape(*x.shape[:-3], h2, 2, w2, 2, x.shape[-1])
    tl = blocks[..., 0, :, 0, :]
    tr = blocks[..., 0, :, 1, :]
    bl = blocks[..., 1, :, 0, :]
    br = blocks[..., 1, :, 1, :]
    d1 = 0.5 * (tr + bl)   # anti-diagonal
    d2 = 0.5 * (tl + br)   # main diagonal
    return d1, d2


def flip_horizontal(image):
    return image[..., :, ::-1, :]


def flip_vertical(image):
    return image[..., ::-1, :, :]


# ---------------------------------------------------------------------------
# BBox format conversions (reference geometry/bbox.py; formats globals.py:289)
# boxes: (..., 4) arrays
# ---------------------------------------------------------------------------

def bbox_xyxy_to_xywh(box):
    x1, y1, x2, y2 = jnp.moveaxis(box, -1, 0)
    return jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)


def bbox_xywh_to_xyxy(box):
    x, y, w, h = jnp.moveaxis(box, -1, 0)
    return jnp.stack([x, y, x + w, y + h], axis=-1)


def bbox_xyxy_to_cxcywhn(box, height: int, width: int):
    x1, y1, x2, y2 = jnp.moveaxis(box, -1, 0)
    cx = (x1 + x2) / 2.0 / width
    cy = (y1 + y2) / 2.0 / height
    w = (x2 - x1) / width
    h = (y2 - y1) / height
    return jnp.stack([cx, cy, w, h], axis=-1)


def bbox_cxcywhn_to_xyxy(box, height: int, width: int):
    cx, cy, w, h = jnp.moveaxis(box, -1, 0)
    x1 = (cx - w / 2.0) * width
    y1 = (cy - h / 2.0) * height
    x2 = (cx + w / 2.0) * width
    y2 = (cy + h / 2.0) * height
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def bbox_iou(box1, box2, eps: float = 1e-8):
    """Pairwise IoU of xyxy boxes, broadcasting: (..., 4) x (..., 4) -> (...)."""
    x1 = jnp.maximum(box1[..., 0], box2[..., 0])
    y1 = jnp.maximum(box1[..., 1], box2[..., 1])
    x2 = jnp.minimum(box1[..., 2], box2[..., 2])
    y2 = jnp.minimum(box1[..., 3], box2[..., 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    a1 = (box1[..., 2] - box1[..., 0]) * (box1[..., 3] - box1[..., 1])
    a2 = (box2[..., 2] - box2[..., 0]) * (box2[..., 3] - box2[..., 1])
    return inter / (a1 + a2 - inter + eps)
