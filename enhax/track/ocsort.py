"""OC-SORT: observation-centric SORT (reference vision/track/ocsort.py).

Extends SORT with (1) observation-centric re-update — on re-association
after occlusion, the filter is corrected along the line between the last and
current observation; (2) velocity-direction consistency in the association
cost; (3) a last-resort byte-style association for low tracks.
"""

from __future__ import annotations

import numpy as np

from enhax.constants import TRACKERS, TrackState
from enhax.track.sort import KalmanBoxTracker, associate, iou_batch


def _speed_direction(b1, b2):
    cx1, cy1 = (b1[0] + b1[2]) / 2, (b1[1] + b1[3]) / 2
    cx2, cy2 = (b2[0] + b2[2]) / 2, (b2[1] + b2[3]) / 2
    v = np.array([cy2 - cy1, cx2 - cx1])
    return v / (np.linalg.norm(v) + 1e-6)


@TRACKERS.register(name="ocsort")
class OCSORT:
    def __init__(self, max_age: int = 30, min_hits: int = 3,
                 iou_threshold: float = 0.3, vdc_weight: float = 0.2):
        self.max_age = max_age
        self.min_hits = min_hits
        self.iou_threshold = iou_threshold
        self.vdc_weight = vdc_weight
        self.trackers: list[KalmanBoxTracker] = []
        self.frame_count = 0

    def update(self, detections: np.ndarray) -> np.ndarray:
        self.frame_count += 1
        dets = np.asarray(detections, float).reshape(-1, 5)
        trks = np.array([t.predict() for t in self.trackers]).reshape(-1, 4)

        # velocity-direction-consistency augmented cost
        if len(dets) and len(trks):
            iou = iou_batch(dets[:, :4], trks)
            vdc = np.zeros_like(iou)
            for j, t in enumerate(self.trackers):
                if len(t.history) >= 2:
                    v_trk = _speed_direction(t.history[-2], t.history[-1])
                    for i, d in enumerate(dets):
                        v_det = _speed_direction(t.last_observation, d[:4])
                        vdc[i, j] = float(v_trk @ v_det)
            cost = iou + self.vdc_weight * vdc
            from scipy.optimize import linear_sum_assignment
            row, col = linear_sum_assignment(-cost)
            matches, md, mt = [], set(), set()
            for r, c in zip(row, col):
                if iou[r, c] >= self.iou_threshold:
                    matches.append((r, c))
                    md.add(r)
                    mt.add(c)
            matches = np.asarray(matches, int).reshape(-1, 2)
            um_d = np.asarray([i for i in range(len(dets)) if i not in md], int)
            um_t = np.asarray([j for j in range(len(trks)) if j not in mt], int)
        else:
            matches, um_d, um_t = associate(dets[:, :4], trks, self.iou_threshold)

        for r, c in matches:
            t = self.trackers[c]
            if t.time_since_update > 1:
                # observation-centric re-update (OC-SORT's ORU): replay a
                # virtual trajectory between the last and current
                # observation as a FILTER rollout — kf update + predict per
                # virtual frame so velocity crosses the gap — without
                # touching hit bookkeeping; the real detection then counts
                # as ONE hit via the normal update (the reference's
                # unfreeze loop, not N simultaneous fusions)
                steps = t.time_since_update
                start = t.last_observation
                end = dets[r, :4]
                for k in range(1, steps):
                    virt = start + (end - start) * (k / steps)
                    t.kf_update(virt)
                    t.kf_predict()
            t.update(dets[r, :4])
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
