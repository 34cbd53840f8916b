"""Multi-object tracking: SORT and OC-SORT.

Rebuild of reference ``vision/track/`` (base.py:27-176 Detection/Track/
Tracker, sort.py:123,222, ocsort.py): host-side numpy trackers — a constant-
velocity Kalman filter over [cx, cy, s, r] box state, IoU association via
the Hungarian algorithm, track lifecycle (NEW/TRACKED/LOST/REMOVED per
globals.py:449 TrackState). OC-SORT adds observation-centric re-update and
velocity-direction consistency.

Detection comes from any detector producing (N, 5) [x1, y1, x2, y2, score]
arrays per frame (the reference wraps ultralytics YOLO the same way).
"""

from enhax.track.sort import SORT, KalmanBoxTracker, iou_batch
from enhax.track.ocsort import OCSORT
