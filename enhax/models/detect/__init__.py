"""Detection layer.

Rebuild of reference ``vision/detect/base.py:30 Detector`` — the reference's
actual detectors are vendored third-party repos (ultralytics YOLO, absent
from its snapshot per SURVEY §2.7); enhax provides the Detector protocol +
a simple anchor-free conv detector so the tracking stack (enhax.track) has
a first-party source of detections.
"""

from enhax.models.detect.base import Detector, Detection, CenterNetLite
from enhax.models.detect import yolo
from enhax.models.detect import yolov8
