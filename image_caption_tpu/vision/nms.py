"""Fixed-shape non-maximum suppression under jit.

The reference calls YOLOv5's dynamic-shape torch NMS
(``/root/reference/data/detect_for_preprocess.py:78``, conf 0.01 / iou 0.45,
``:28-29``).  Dynamic output counts don't compile on TPU, so this NMS is a
static top-k + suppression matrix:

  1. per-cell score = objectness * max class prob; conf-threshold mask;
  2. top-``pre_nms`` candidates by score (static k);
  3. class-aware suppression: an O(k^2) IoU matrix (k <= 256 — tiny on the
     VPU) and a sequential keep-scan over score order;
  4. emit exactly ``max_det`` boxes, zero-padded, with a validity mask.

Matches torchvision-style hard NMS decisions for the kept set.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Detections(NamedTuple):
    boxes: jnp.ndarray       # [max_det, 4] xyxy (canvas pixels)
    scores: jnp.ndarray      # [max_det]
    classes: jnp.ndarray     # [max_det] int32
    valid: jnp.ndarray       # [max_det] bool


def xywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     axis=-1)


def iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a [N,4], b [M,4] xyxy -> [N,M] IoU."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


@partial(jax.jit, static_argnames=("max_det", "pre_nms"))
def nms_fixed(boxes_xyxy: jnp.ndarray, scores: jnp.ndarray,
              classes: jnp.ndarray, *, iou_thres: float = 0.45,
              conf_thres: float = 0.01, max_det: int = 36,
              pre_nms: int = 256) -> Detections:
    """Single-image class-aware NMS with static shapes.

    boxes_xyxy [N,4], scores [N], classes [N] int32.
    """
    n = scores.shape[0]
    k = min(pre_nms, n)
    conf_ok = scores > conf_thres
    masked_scores = jnp.where(conf_ok, scores, -1.0)
    top_scores, idx = jax.lax.top_k(masked_scores, k)     # sorted desc
    top_boxes = boxes_xyxy[idx]
    top_classes = classes[idx]
    top_valid = top_scores > conf_thres

    # class-aware: offset boxes per class so cross-class IoU is 0
    # (the standard batched-NMS trick)
    span = (jnp.max(boxes_xyxy) - jnp.min(boxes_xyxy)) + 1.0
    offset = top_classes.astype(jnp.float32)[:, None] * span
    shifted = top_boxes + offset

    iou = iou_matrix(shifted, shifted)

    def body(i, keep):
        # suppressed if any higher-scoring kept box overlaps > thres
        overlap = (iou[i] > iou_thres) & keep
        higher = jnp.arange(k) < i
        suppressed = jnp.any(overlap & higher)
        return keep.at[i].set(keep[i] & ~suppressed)

    keep = jax.lax.fori_loop(0, k, body, top_valid)

    # compact kept boxes to the front, pad to max_det
    order = jnp.argsort(~keep, stable=True)               # kept first
    keep_sorted = keep[order]
    boxes_out = top_boxes[order][:max_det]
    scores_out = jnp.where(keep_sorted, top_scores[order], 0.0)[:max_det]
    classes_out = jnp.where(keep_sorted, top_classes[order], 0)[:max_det]
    valid_out = keep_sorted[:max_det]
    boxes_out = jnp.where(valid_out[:, None], boxes_out, 0.0)
    return Detections(boxes=boxes_out, scores=scores_out,
                      classes=classes_out.astype(jnp.int32),
                      valid=valid_out)


@partial(jax.jit, static_argnames=("max_det", "pre_nms", "num_classes"))
def yolo_postprocess(pred: jnp.ndarray, *, num_classes: int = 80,
                     iou_thres: float = 0.45, conf_thres: float = 0.01,
                     max_det: int = 36, pre_nms: int = 256) -> Detections:
    """YOLO head output [N, 5+C] (xywh, obj, class probs) -> Detections.

    Score = obj * max class prob, class = argmax (single-label mode, the
    path the reference uses — non_max_suppression default multi_label=False
    for 80 classes)."""
    boxes = xywh_to_xyxy(pred[:, :4])
    obj = pred[:, 4]
    cls_probs = pred[:, 5:5 + num_classes]
    cls_idx = jnp.argmax(cls_probs, axis=-1).astype(jnp.int32)
    score = obj * jnp.max(cls_probs, axis=-1)
    return nms_fixed(boxes, score, cls_idx, iou_thres=iou_thres,
                     conf_thres=conf_thres, max_det=max_det,
                     pre_nms=pre_nms)
