"""Faster R-CNN (resnet50-FPN) as a fixed-shape XLA graph.

The reference's alternative region proposer is torchvision
``fasterrcnn_resnet50_fpn(pretrained=True)`` run one image at a time
(``/root/reference/core/preprocess.py:65-86``).  This is a functional
re-implementation of that network's inference path with every stage
static-shape for TPU:

  * ResNet-50 C2-C5 -> FPN P2-P5 (+P6 maxpool);
  * RPN: 3x3 conv head, 3 anchors/cell per level (sizes 32..512,
    ratios 0.5/1/2), per-level top-k objectness, joint fixed-shape NMS
    (iou 0.7) -> ``num_proposals`` boxes;
  * ROIAlign: torchvision level assignment
    ``k = 2 + clip(floor(log2(sqrt(area)/224 + eps)) + 4 - 2)`` realized as
    compute-on-every-level + select (static shapes, 4x redundant compute on
    tiny 7x7 crops — cheap next to the backbone);
  * box head fc6/fc7 -> class scores (softmax over 91) + per-class deltas,
    class-aware fixed NMS (score 0.05, iou 0.5) -> top detections sorted by
    score, matching the torchvision output contract
    (boxes/scores/labels, background dropped, labels 1-based).

Input geometry: images are letterboxed to a square canvas
(default 800) instead of torchvision's dynamic min-800/max-1333 resize —
the only deviation, needed for static shapes; boxes are mapped back to
original pixels.

Weight import handles both old (``inner_blocks.{i}.weight``) and new
(``inner_blocks.{i}.0.weight``) torchvision FPN namings.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .nms import nms_fixed
from .ops import crop_and_resize
from .resnet import (RESNET50_STAGES, _conv_init, init_resnet,
                     resnet_feature_maps)

Params = Dict[str, Any]

FPN_DIM = 256
ANCHOR_SIZES = (32, 64, 128, 256, 512)      # per level P2..P6
ANCHOR_RATIOS = (0.5, 1.0, 2.0)
NUM_CLASSES = 91                             # incl. background at 0
BBOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _linear_init(key, cin, cout):
    bound = 1.0 / math.sqrt(cin)
    k1, k2 = jax.random.split(key)
    return {"kernel": jax.random.uniform(k1, (cin, cout), jnp.float32,
                                         -bound, bound),
            "bias": jax.random.uniform(k2, (cout,), jnp.float32,
                                       -bound, bound)}


def _convb_init(key, k, cin, cout):
    return {"kernel": _conv_init(key, k, k, cin, cout),
            "bias": jnp.zeros((cout,), jnp.float32)}


def init_frcnn(key) -> Params:
    ks = jax.random.split(key, 16)
    num_anchors = len(ANCHOR_RATIOS)
    return {
        "backbone": init_resnet(ks[0], stages=RESNET50_STAGES),
        "fpn": {
            "inner": [_convb_init(ks[1 + i], 1, c, FPN_DIM)
                      for i, c in enumerate((256, 512, 1024, 2048))],
            "layer": [_convb_init(ks[5 + i], 3, FPN_DIM, FPN_DIM)
                      for i in range(4)],
        },
        "rpn": {
            "conv": _convb_init(ks[9], 3, FPN_DIM, FPN_DIM),
            "cls": _convb_init(ks[10], 1, FPN_DIM, num_anchors),
            "bbox": _convb_init(ks[11], 1, FPN_DIM, num_anchors * 4),
        },
        "box_head": {
            "fc6": _linear_init(ks[12], FPN_DIM * 7 * 7, 1024),
            "fc7": _linear_init(ks[13], 1024, 1024),
            "cls_score": _linear_init(ks[14], 1024, NUM_CLASSES),
            "bbox_pred": _linear_init(ks[15], 1024, NUM_CLASSES * 4),
        },
    }


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def _convb(p, x, stride=1, k=None):
    k = k or p["kernel"].shape[0]
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y.astype(x.dtype) + p["bias"].astype(x.dtype)


def fpn_apply(p: Params, cmaps: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """C2..C5 -> P2..P5 + P6 (maxpool stride 2 of P5)."""
    inners = [_convb(pi, c) for pi, c in zip(p["inner"], cmaps)]
    outs = [None] * 4
    last = inners[3]
    outs[3] = _convb(p["layer"][3], last)
    for i in (2, 1, 0):
        b, h, w, c = inners[i].shape
        up = jax.image.resize(last, (b, h, w, c), method="nearest")
        last = inners[i] + up
        outs[i] = _convb(p["layer"][i], last)
    p6 = jax.lax.reduce_window(
        outs[3], -jnp.inf, jax.lax.max, (1, 1, 1, 1), (1, 2, 2, 1),
        [(0, 0), (0, 0), (0, 0), (0, 0)])
    return outs + [p6]


def _level_anchors(h: int, w: int, stride: int, size: int) -> np.ndarray:
    """[h*w*A, 4] xyxy anchors for one level (torchvision AnchorGenerator:
    centers at cell*stride, area size^2, aspect ratios h/w)."""
    anchors = []
    for ratio in ANCHOR_RATIOS:
        ah = size * math.sqrt(ratio)
        aw = size / math.sqrt(ratio)
        anchors.append([-aw / 2, -ah / 2, aw / 2, ah / 2])
    base = np.asarray(anchors, np.float32)                  # [A, 4]
    ys = (np.arange(h, dtype=np.float32)) * stride
    xs = (np.arange(w, dtype=np.float32)) * stride
    cx, cy = np.meshgrid(xs, ys)
    shifts = np.stack([cx, cy, cx, cy], axis=-1).reshape(-1, 1, 4)
    return (shifts + base[None]).reshape(-1, 4)


def decode_deltas(anchors: jnp.ndarray, deltas: jnp.ndarray,
                  weights=BBOX_REG_WEIGHTS) -> jnp.ndarray:
    """torchvision BoxCoder.decode: deltas [N,4] (dx,dy,dw,dh) on xyxy
    anchors."""
    wx, wy, ww, wh = weights
    ax = (anchors[:, 0] + anchors[:, 2]) / 2
    ay = (anchors[:, 1] + anchors[:, 3]) / 2
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    dx, dy, dw, dh = (deltas[:, 0] / wx, deltas[:, 1] / wy,
                      deltas[:, 2] / ww, deltas[:, 3] / wh)
    dw = jnp.clip(dw, None, math.log(1000.0 / 16))
    dh = jnp.clip(dh, None, math.log(1000.0 / 16))
    cx = dx * aw + ax
    cy = dy * ah + ay
    w = jnp.exp(dw) * aw
    h = jnp.exp(dh) * ah
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     axis=-1)


# ---------------------------------------------------------------------------
# RPN
# ---------------------------------------------------------------------------

def rpn_proposals(p: Params, pmaps: List[jnp.ndarray], canvas: int, *,
                  pre_nms_per_level: int = 200,
                  num_proposals: int = 256) -> jnp.ndarray:
    """Single image: FPN maps -> [num_proposals, 4] proposal boxes."""
    all_scores, all_boxes = [], []
    strides = (4, 8, 16, 32, 64)
    for lvl, fm in enumerate(pmaps):
        t = jax.nn.relu(_convb(p["conv"], fm))
        logits = _convb(p["cls"], t)[0]                      # [h,w,A]
        deltas = _convb(p["bbox"], t)[0]                     # [h,w,A*4]
        h, w, a = logits.shape
        anchors = jnp.asarray(_level_anchors(h, w, strides[lvl],
                                             ANCHOR_SIZES[lvl]))
        scores = logits.reshape(-1)
        deltas = deltas.reshape(-1, 4)
        k = min(pre_nms_per_level, scores.shape[0])
        top, idx = jax.lax.top_k(scores, k)
        boxes = decode_deltas(anchors[idx], deltas[idx])
        boxes = jnp.clip(boxes, 0, canvas)
        all_scores.append(top)
        all_boxes.append(boxes)
    scores = jax.nn.sigmoid(jnp.concatenate(all_scores))
    boxes = jnp.concatenate(all_boxes)
    # drop degenerate boxes (torchvision min_size 1e-3)
    ok = ((boxes[:, 2] - boxes[:, 0]) > 1e-3) & \
         ((boxes[:, 3] - boxes[:, 1]) > 1e-3)
    scores = jnp.where(ok, scores, 0.0)
    det = nms_fixed(boxes, scores, jnp.zeros_like(scores, jnp.int32),
                    iou_thres=0.7, conf_thres=0.0,
                    max_det=num_proposals, pre_nms=boxes.shape[0])
    return det.boxes


# ---------------------------------------------------------------------------
# ROI heads
# ---------------------------------------------------------------------------

def roi_align(pmaps: List[jnp.ndarray], boxes: jnp.ndarray,
              out: int = 7) -> jnp.ndarray:
    """MultiScaleRoIAlign over P2..P5: assign each box to level
    ``2 + floor(log2(sqrt(area)/224))`` clipped to [2,5]; computed on every
    level and selected (static shapes).  boxes in canvas pixels."""
    area = jnp.clip((boxes[:, 2] - boxes[:, 0]) *
                    (boxes[:, 3] - boxes[:, 1]), 1e-6)
    lvl = jnp.floor(jnp.log2(jnp.sqrt(area) / 224.0 + 1e-6)) + 4
    lvl = jnp.clip(lvl, 2, 5).astype(jnp.int32) - 2          # 0..3

    crops = []
    for i, fm in enumerate(pmaps[:4]):
        stride = (4, 8, 16, 32)[i]
        crops.append(crop_and_resize(fm[0], boxes / stride, out_size=out,
                                     method="linear"))
    stacked = jnp.stack(crops)                               # [4,N,7,7,C]
    sel = jax.nn.one_hot(lvl, 4, dtype=stacked.dtype)        # [N,4]
    return jnp.einsum("lnhwc,nl->nhwc", stacked, sel)


def box_head_apply(p: Params, rois: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    x = rois.reshape(rois.shape[0], -1)
    x = jax.nn.relu(x @ p["fc6"]["kernel"] + p["fc6"]["bias"])
    x = jax.nn.relu(x @ p["fc7"]["kernel"] + p["fc7"]["bias"])
    scores = x @ p["cls_score"]["kernel"] + p["cls_score"]["bias"]
    deltas = x @ p["bbox_pred"]["kernel"] + p["bbox_pred"]["bias"]
    return scores, deltas


class FrcnnDetections(NamedTuple):
    boxes: jnp.ndarray      # [max_det, 4] canvas px
    scores: jnp.ndarray     # [max_det]
    labels: jnp.ndarray     # [max_det] int32, 1-based (0 = invalid slot)
    valid: jnp.ndarray      # [max_det] bool


@partial(jax.jit, static_argnames=("canvas", "max_det", "num_proposals"))
def frcnn_detect_single(params: Params, image: jnp.ndarray, *,
                        canvas: int = 800, max_det: int = 36,
                        num_proposals: int = 256,
                        score_thresh: float = 0.05,
                        nms_thresh: float = 0.5) -> FrcnnDetections:
    """One [canvas,canvas,3] ImageNet-normalized image -> detections."""
    cmaps = resnet_feature_maps(params["backbone"], image[None])
    pmaps = fpn_apply(params["fpn"], cmaps)
    proposals = rpn_proposals(params["rpn"], pmaps, canvas,
                              num_proposals=num_proposals)
    rois = roi_align(pmaps, proposals)
    scores, deltas = box_head_apply(params["box_head"], rois)
    probs = jax.nn.softmax(scores, axis=-1)                  # [N, 91]

    # per-class decode (drop background 0), flatten classes into the NMS
    n = proposals.shape[0]
    cls_ids = jnp.arange(1, NUM_CLASSES)
    deltas = deltas.reshape(n, NUM_CLASSES, 4)[:, 1:]        # [N, 90, 4]
    boxes = jax.vmap(decode_deltas, in_axes=(None, 1), out_axes=1)(
        proposals, deltas)                                   # [N, 90, 4]
    boxes = jnp.clip(boxes, 0, canvas)
    flat_boxes = boxes.reshape(-1, 4)
    flat_scores = probs[:, 1:].reshape(-1)
    flat_labels = jnp.broadcast_to(cls_ids[None], (n, NUM_CLASSES - 1)
                                   ).reshape(-1)
    det = nms_fixed(flat_boxes, flat_scores, flat_labels,
                    iou_thres=nms_thresh, conf_thres=score_thresh,
                    max_det=max_det, pre_nms=min(1024, flat_scores.shape[0]))
    return FrcnnDetections(boxes=det.boxes, scores=det.scores,
                           labels=det.classes, valid=det.valid)


# ---------------------------------------------------------------------------
# Torch weight import (torchvision fasterrcnn_resnet50_fpn)
# ---------------------------------------------------------------------------

def _np(v):
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def _imp_convb(sd, name):
    w = _np(sd[f"{name}.weight"]).astype(np.float32)
    p = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}
    bias_key = f"{name}.bias"
    p["bias"] = (jnp.asarray(_np(sd[bias_key]).astype(np.float32))
                 if bias_key in sd else jnp.zeros((w.shape[0],), jnp.float32))
    return p


def _imp_linear(sd, name):
    w = _np(sd[f"{name}.weight"]).astype(np.float32)
    return {"kernel": jnp.asarray(np.ascontiguousarray(w.T)),
            "bias": jnp.asarray(_np(sd[f"{name}.bias"]).astype(np.float32))}


def import_torch_state_dict(sd: Dict[str, Any]) -> Params:
    from .resnet import import_torch_state_dict as import_resnet
    sd = {k: _np(v) for k, v in sd.items()}

    body = {k[len("backbone.body."):]: v for k, v in sd.items()
            if k.startswith("backbone.body.")}
    backbone = import_resnet(body, stages=RESNET50_STAGES)

    def fpn_name(kind, i):
        new = f"backbone.fpn.{kind}.{i}.0"
        old = f"backbone.fpn.{kind}.{i}"
        return new if f"{new}.weight" in sd else old

    fpn = {"inner": [_imp_convb(sd, fpn_name("inner_blocks", i))
                     for i in range(4)],
           "layer": [_imp_convb(sd, fpn_name("layer_blocks", i))
                     for i in range(4)]}

    def rpn_name(base):
        new = f"rpn.head.{base}.0.0" if base == "conv" else f"rpn.head.{base}"
        old = f"rpn.head.{base}"
        return new if f"{new}.weight" in sd else old

    rpn = {"conv": _imp_convb(sd, rpn_name("conv")),
           "cls": _imp_convb(sd, "rpn.head.cls_logits"),
           "bbox": _imp_convb(sd, "rpn.head.bbox_pred")}

    # fc6 consumes the flattened ROI: torch flattens (C,7,7), we flatten
    # (7,7,C) — permute the kernel's input dim accordingly
    fc6 = _imp_linear(sd, "roi_heads.box_head.fc6")
    k = np.asarray(fc6["kernel"])                  # [C*49, 1024]
    k = k.reshape(FPN_DIM, 7, 7, -1).transpose(1, 2, 0, 3).reshape(
        7 * 7 * FPN_DIM, -1)
    fc6["kernel"] = jnp.asarray(np.ascontiguousarray(k))

    box_head = {"fc6": fc6,
                "fc7": _imp_linear(sd, "roi_heads.box_head.fc7"),
                "cls_score": _imp_linear(sd,
                                         "roi_heads.box_predictor.cls_score"),
                "bbox_pred": _imp_linear(
                    sd, "roi_heads.box_predictor.bbox_pred")}

    return {"backbone": backbone, "fpn": fpn, "rpn": rpn,
            "box_head": box_head}


def load_checkpoint(path: str) -> Params:
    if path.endswith(".npz"):
        return import_torch_state_dict(dict(np.load(path)))
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return import_torch_state_dict(sd)
