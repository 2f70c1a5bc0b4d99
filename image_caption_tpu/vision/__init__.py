"""Vision subsystem: detectors, encoders, extraction pipeline, ETL."""

from .nms import Detections, nms_fixed, yolo_postprocess  # noqa: F401
from .ops import crop_and_resize, letterbox_image  # noqa: F401
