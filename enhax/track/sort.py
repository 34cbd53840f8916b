"""SORT: simple online and realtime tracking (reference vision/track/sort.py).

Kalman state: x = [cx, cy, s, r, vcx, vcy, vs]; constant velocity; IoU
association with Hungarian matching; max_age / min_hits lifecycle.
"""

from __future__ import annotations

import numpy as np

from enhax.constants import MOTIONS, TRACKERS, TrackState


def iou_batch(bb_test: np.ndarray, bb_gt: np.ndarray) -> np.ndarray:
    """(N, 4) x (M, 4) xyxy -> (N, M) IoU."""
    bb_gt = np.expand_dims(bb_gt, 0)
    bb_test = np.expand_dims(bb_test, 1)
    xx1 = np.maximum(bb_test[..., 0], bb_gt[..., 0])
    yy1 = np.maximum(bb_test[..., 1], bb_gt[..., 1])
    xx2 = np.minimum(bb_test[..., 2], bb_gt[..., 2])
    yy2 = np.minimum(bb_test[..., 3], bb_gt[..., 3])
    w = np.maximum(0.0, xx2 - xx1)
    h = np.maximum(0.0, yy2 - yy1)
    inter = w * h
    a1 = (bb_test[..., 2] - bb_test[..., 0]) * (bb_test[..., 3] - bb_test[..., 1])
    a2 = (bb_gt[..., 2] - bb_gt[..., 0]) * (bb_gt[..., 3] - bb_gt[..., 1])
    return inter / np.maximum(a1 + a2 - inter, 1e-8)


def _bbox_to_z(bbox):
    w = bbox[2] - bbox[0]
    h = bbox[3] - bbox[1]
    return np.array([bbox[0] + w / 2, bbox[1] + h / 2, w * h,
                     w / max(h, 1e-6)]).reshape((4, 1))


def _z_to_bbox(x):
    w = np.sqrt(max(x[2] * x[3], 1e-8))
    h = x[2] / max(w, 1e-6)
    return np.array([x[0] - w / 2, x[1] - h / 2, x[0] + w / 2, x[1] + h / 2]).reshape(4)


@MOTIONS.register(name="kf_bbox_motion")
class KalmanBoxTracker:
    """Constant-velocity Kalman filter for one track (the reference's
    KFBBoxMotion, track_old/motion/kalman_filter.py)."""

    count = 0

    def __init__(self, bbox):
        self.F = np.eye(7)
        for i in range(3):
            self.F[i, i + 4] = 1.0
        self.H = np.eye(4, 7)
        self.P = np.diag([10., 10., 10., 10., 1e4, 1e4, 1e4])
        self.Q = np.diag([1., 1., 1., 1., 0.01, 0.01, 1e-4])
        self.R = np.diag([1., 1., 10., 10.])
        self.x = np.zeros((7, 1))
        self.x[:4] = _bbox_to_z(bbox)
        KalmanBoxTracker.count += 1
        self.id = KalmanBoxTracker.count
        self.hits = 1
        self.hit_streak = 1
        self.time_since_update = 0
        self.age = 0
        self.state = TrackState.NEW
        self.last_observation = np.asarray(bbox, dtype=float)
        self.history: list[np.ndarray] = []

    def predict(self):
        if self.x[6] + self.x[2] <= 0:
            self.x[6] = 0.0
        self.x = self.F @ self.x
        self.P = self.F @ self.P @ self.F.T + self.Q
        self.age += 1
        if self.time_since_update > 0:
            self.hit_streak = 0
        self.time_since_update += 1
        self.history.append(self.get_bbox())
        return self.history[-1]

    def kf_update(self, bbox):
        """Raw measurement fusion with no hit/state bookkeeping (used by
        OC-SORT's observation-centric re-update rollout)."""
        z = _bbox_to_z(bbox)
        y = z - self.H @ self.x
        S = self.H @ self.P @ self.H.T + self.R
        K = self.P @ self.H.T @ np.linalg.inv(S)
        self.x = self.x + K @ y
        self.P = (np.eye(7) - K @ self.H) @ self.P

    def kf_predict(self):
        """Raw time step with no age/streak bookkeeping (ORU rollout)."""
        if self.x[6] + self.x[2] <= 0:
            self.x[6] = 0.0
        self.x = self.F @ self.x
        self.P = self.F @ self.P @ self.F.T + self.Q

    def update(self, bbox):
        self.kf_update(bbox)
        self.time_since_update = 0
        self.hits += 1
        self.hit_streak += 1
        self.state = TrackState.TRACKED
        self.last_observation = np.asarray(bbox[:4], dtype=float)

    def get_bbox(self):
        return _z_to_bbox(self.x[:, 0])


def associate(dets, trks, iou_threshold=0.3):
    """IoU Hungarian association -> (matches, unmatched_dets, unmatched_trks)."""
    if len(trks) == 0 or len(dets) == 0:
        return (np.empty((0, 2), int), np.arange(len(dets)), np.arange(len(trks)))
    iou = iou_batch(dets, trks)
    from scipy.optimize import linear_sum_assignment
    row, col = linear_sum_assignment(-iou)
    matches, um_d, um_t = [], [], []
    matched_d = set()
    matched_t = set()
    for r, c in zip(row, col):
        if iou[r, c] >= iou_threshold:
            matches.append((r, c))
            matched_d.add(r)
            matched_t.add(c)
    um_d = [d for d in range(len(dets)) if d not in matched_d]
    um_t = [t for t in range(len(trks)) if t not in matched_t]
    return (np.asarray(matches, int).reshape(-1, 2),
            np.asarray(um_d, int), np.asarray(um_t, int))


@TRACKERS.register(name="sort", aliases=["sort_bbox"])
class SORT:
    """reference sort.py:222 Tracker."""

    def __init__(self, max_age: int = 1, min_hits: int = 3,
                 iou_threshold: float = 0.3):
        self.max_age = max_age
        self.min_hits = min_hits
        self.iou_threshold = iou_threshold
        self.trackers: list[KalmanBoxTracker] = []
        self.frame_count = 0

    def update(self, detections: np.ndarray) -> np.ndarray:
        """detections: (N, 5) [x1,y1,x2,y2,score]. Returns (M, 5)
        [x1,y1,x2,y2,track_id] for confirmed tracks."""
        self.frame_count += 1
        dets = np.asarray(detections, float).reshape(-1, 5)
        trks = np.array([t.predict() for t in self.trackers]).reshape(-1, 4)
        matches, um_d, um_t = associate(dets[:, :4], trks, self.iou_threshold)

        for r, c in matches:
            self.trackers[c].update(dets[r, :4])
        for i in um_d:
            self.trackers.append(KalmanBoxTracker(dets[i, :4]))
        for i in um_t:
            if self.trackers[i].time_since_update > self.max_age:
                self.trackers[i].state = TrackState.REMOVED
            else:
                self.trackers[i].state = TrackState.LOST

        out = []
        keep = []
        for t in self.trackers:
            if t.state != TrackState.REMOVED:
                keep.append(t)
                if (t.time_since_update < 1 and
                        (t.hit_streak >= self.min_hits
                         or self.frame_count <= self.min_hits)):
                    out.append(np.concatenate([t.get_bbox(), [t.id]]))
        self.trackers = keep
        return np.asarray(out).reshape(-1, 5)
