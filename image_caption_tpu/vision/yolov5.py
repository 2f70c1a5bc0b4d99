"""YOLOv5 detector as a fixed-shape XLA graph.

The reference loads the ultralytics YOLOv5x torch graph *per call* and runs
dynamic-shape NMS (``/root/reference/data/detect_for_preprocess.py:16-78``).
Here the network is a pure function over a param pytree — CSP backbone,
PANet neck, and anchor-based detect head — built once per process, NHWC,
inference BatchNorm folded to scale/bias, batched over images, with the
fixed-shape NMS from ``vision.nms``.

Architecture follows the published YOLOv5 v6.x spec (yolov5x:
depth x1.33 / width x1.25 — stage repeats (4,8,12,4), widths
(80,160,320,640,1280)); the v5.0-era Focus stem is supported for older
checkpoints (auto-detected at import from the stem kernel shape).

Weight import maps an ultralytics ``model.model.state_dict()`` (exported to
npz or loadable torch file) onto this pytree; random init otherwise.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .nms import Detections

Params = Dict[str, Any]

BN_EPS = 1e-3           # ultralytics BatchNorm2d(eps=1e-3)

# yolov5 default COCO anchors per scale (P3/8, P4/16, P5/32)
YOLO_ANCHORS = np.array([
    [[10, 13], [16, 30], [33, 23]],
    [[30, 61], [62, 45], [59, 119]],
    [[116, 90], [156, 198], [373, 326]],
], np.float32)
YOLO_STRIDES = (8, 16, 32)


def yolov5_spec(depth_multiple: float = 1.33, width_multiple: float = 1.25):
    """(stage_repeats, widths) for a yolov5 scale; x = (1.33, 1.25)."""
    def gd(n):
        return max(round(n * depth_multiple), 1)

    def gw(c):
        return int(math.ceil(c * width_multiple / 8) * 8)

    widths = tuple(gw(c) for c in (64, 128, 256, 512, 1024))
    repeats = tuple(gd(n) for n in (3, 6, 9, 3))
    head_n = gd(3)
    return repeats, widths, head_n


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, (kh, kw, cin, cout), jnp.float32,
                              -bound, bound)


def _bn_init(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def _init_convbn(key, k, cin, cout) -> Params:
    return {"conv": _conv_init(key, k, k, cin, cout), "bn": _bn_init(cout)}


def _init_bottleneck(key, c) -> Params:
    k1, k2 = jax.random.split(key)
    return {"cv1": _init_convbn(k1, 1, c, c),
            "cv2": _init_convbn(k2, 3, c, c)}


def _init_c3(key, cin, cout, n) -> Params:
    ch = cout // 2
    ks = jax.random.split(key, 3 + n)
    return {
        "cv1": _init_convbn(ks[0], 1, cin, ch),
        "cv2": _init_convbn(ks[1], 1, cin, ch),
        "cv3": _init_convbn(ks[2], 1, 2 * ch, cout),
        "m": [_init_bottleneck(ks[3 + i], ch) for i in range(n)],
    }


def _init_sppf(key, c) -> Params:
    k1, k2 = jax.random.split(key)
    return {"cv1": _init_convbn(k1, 1, c, c // 2),
            "cv2": _init_convbn(k2, 1, 2 * c, c)}


def init_yolov5(key, *, num_classes: int = 80,
                depth_multiple: float = 1.33,
                width_multiple: float = 1.25,
                focus_stem: bool = False) -> Params:
    (n3, n6, n9, n3b), (w64, w128, w256, w512, w1024), hn = yolov5_spec(
        depth_multiple, width_multiple)
    ks = jax.random.split(key, 24)
    no = 3 * (5 + num_classes)
    p: Params = {
        # backbone
        "b0": _init_convbn(ks[0], 3 if focus_stem else 6,
                           12 if focus_stem else 3, w64),
        "b1": _init_convbn(ks[1], 3, w64, w128),
        "b2": _init_c3(ks[2], w128, w128, n3),
        "b3": _init_convbn(ks[3], 3, w128, w256),
        "b4": _init_c3(ks[4], w256, w256, n6),
        "b5": _init_convbn(ks[5], 3, w256, w512),
        "b6": _init_c3(ks[6], w512, w512, n9),
        "b7": _init_convbn(ks[7], 3, w512, w1024),
        "b8": _init_c3(ks[8], w1024, w1024, n3b),
        "b9": _init_sppf(ks[9], w1024),
        # head
        "h10": _init_convbn(ks[10], 1, w1024, w512),
        "h13": _init_c3(ks[11], w1024, w512, hn),
        "h14": _init_convbn(ks[12], 1, w512, w256),
        "h17": _init_c3(ks[13], w512, w256, hn),
        "h18": _init_convbn(ks[14], 3, w256, w256),
        "h20": _init_c3(ks[15], w512, w512, hn),
        "h21": _init_convbn(ks[16], 3, w512, w512),
        "h23": _init_c3(ks[17], w1024, w1024, hn),
        # detect: per-scale 1x1 conv with bias
        "detect": {
            "convs": [
                {"kernel": _conv_init(ks[18], 1, 1, w256, no),
                 "bias": jnp.zeros((no,), jnp.float32)},
                {"kernel": _conv_init(ks[19], 1, 1, w512, no),
                 "bias": jnp.zeros((no,), jnp.float32)},
                {"kernel": _conv_init(ks[20], 1, 1, w1024, no),
                 "bias": jnp.zeros((no,), jnp.float32)},
            ],
            "anchors": jnp.asarray(YOLO_ANCHORS),
        },
    }
    return p


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _conv(x, w, stride, k):
    # ultralytics Conv: pad = k//2 for odd kernels, explicit 2 for the
    # 6x6 v6.0 stem (general even-k rule: k//2 - 1)
    pad = k // 2 if k % 2 == 1 else k // 2 - 1
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _convbn(p, x, stride=1):
    k = p["conv"].shape[0]
    y = _conv(x, p["conv"], stride, k)
    y = y * p["bn"]["scale"].astype(y.dtype) \
        + p["bn"]["bias"].astype(y.dtype)
    return jax.nn.silu(y)


def _bottleneck(p, x, shortcut):
    y = _convbn(p["cv2"], _convbn(p["cv1"], x))
    return x + y if shortcut else y


def _c3(p, x, shortcut=True):
    y1 = _convbn(p["cv1"], x)
    for m in p["m"]:
        y1 = _bottleneck(m, y1, shortcut)
    y2 = _convbn(p["cv2"], x)
    return _convbn(p["cv3"], jnp.concatenate([y1, y2], axis=-1))


def _sppf(p, x):
    y = _convbn(p["cv1"], x)
    pools = [y]
    for _ in range(3):
        pools.append(jax.lax.reduce_window(
            pools[-1], -jnp.inf, jax.lax.max, (1, 5, 5, 1), (1, 1, 1, 1),
            [(0, 0), (2, 2), (2, 2), (0, 0)]))
    return _convbn(p["cv2"], jnp.concatenate(pools, axis=-1))


def _upsample2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")


def _focus(x):
    """v5.0 Focus: space-to-depth 2x2 -> 12 channels."""
    return jnp.concatenate([x[:, ::2, ::2], x[:, 1::2, ::2],
                            x[:, ::2, 1::2], x[:, 1::2, 1::2]], axis=-1)


def _space_to_depth2(x):
    """[N,H,W,C] -> [N,H/2,W/2,4C] via reshape/transpose (no strided
    gathers — XLA lowers this as a pure relayout).  Channel order is
    (row-phase, col-phase, c), row-major."""
    n, h, w, c = x.shape
    xs = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return xs.reshape(n, h // 2, w // 2, 4 * c)


def _stem_s2d_kernel(w):
    """Rearrange the 6x6/stride-2 stem kernel [6,6,3,C] into the exactly
    equivalent 3x3/stride-1 kernel [3,3,12,C] over the 2x2 space-to-depth
    input: output cell o reads input rows 2o-2..2o+3 (pad 2), i.e. s2d
    blocks o-1..o+1 (pad 1) — tap kh=2*t+p maps to (block-tap t, phase p),
    matching ``_space_to_depth2``'s (ph, pw, c) channel order.  Same MACs,
    same sums — bit-comparable up to reassociation."""
    c_out = w.shape[-1]
    k = w.reshape(3, 2, 3, 2, 3, c_out).transpose(0, 2, 1, 3, 4, 5)
    return k.reshape(3, 3, 12, c_out)


def _stem_conv_s2d(p, x):
    """v6.0 stem as s2d + 3x3/s1 conv.  An isolated-timing artifact made
    the direct 6x6/s2 conv look like a 17 ms MXU-starvation hotspot, but
    in the full graph this form measures ~3 ms slower — kept (off by
    default) as the documented rejected experiment; see
    docs/performance.md."""
    xs = _space_to_depth2(x)
    k = _stem_s2d_kernel(p["conv"]).astype(xs.dtype)
    y = jax.lax.conv_general_dilated(
        xs, k, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(xs.dtype)
    y = y * p["bn"]["scale"].astype(y.dtype) \
        + p["bn"]["bias"].astype(y.dtype)
    return jax.nn.silu(y)


def yolov5_raw(params: Params, images: jnp.ndarray,
               compute_dtype=jnp.float32, *,
               focus_stem: bool = False,
               s2d_stem: bool = False) -> List[jnp.ndarray]:
    """images [B, S, S, 3] in [0,1] -> per-scale raw head outputs
    [B, H, W, 3*(5+C)].  ``focus_stem`` selects the v5.0 Focus stem
    (static — auto-derivable from the stem kernel: in-channels == 12);
    ``s2d_stem`` runs the v6.0 stem in its space-to-depth form (exactly
    equivalent, see ``_stem_conv_s2d``) — measured ~3 ms SLOWER in the
    full graph at B=32 (docs/performance.md), kept for study."""
    x = images.astype(compute_dtype)
    if focus_stem:
        x = _convbn(params["b0"], _focus(x), 1)
    elif s2d_stem:
        x = _stem_conv_s2d(params["b0"], x)
    else:
        x = _convbn(params["b0"], x, 2)
    x = _convbn(params["b1"], x, 2)
    x = _c3(params["b2"], x)
    x = _convbn(params["b3"], x, 2)
    p3 = _c3(params["b4"], x)                     # /8
    x = _convbn(params["b5"], p3, 2)
    p4 = _c3(params["b6"], x)                     # /16
    x = _convbn(params["b7"], p4, 2)
    x = _c3(params["b8"], x)
    p5 = _sppf(params["b9"], x)                   # /32

    # PANet (head C3s have no residual shortcut)
    h10 = _convbn(params["h10"], p5)
    x = jnp.concatenate([_upsample2(h10), p4], axis=-1)
    h13 = _c3(params["h13"], x, shortcut=False)
    h14 = _convbn(params["h14"], h13)
    x = jnp.concatenate([_upsample2(h14), p3], axis=-1)
    out3 = _c3(params["h17"], x, shortcut=False)  # /8 head
    x = jnp.concatenate([_convbn(params["h18"], out3, 2), h14], axis=-1)
    out4 = _c3(params["h20"], x, shortcut=False)  # /16 head
    x = jnp.concatenate([_convbn(params["h21"], out4, 2), h10], axis=-1)
    out5 = _c3(params["h23"], x, shortcut=False)  # /32 head

    raw = []
    for feat, conv in zip((out3, out4, out5), params["detect"]["convs"]):
        y = jax.lax.conv_general_dilated(
            feat, conv["kernel"].astype(feat.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        raw.append(y.astype(jnp.float32) + conv["bias"])
    return raw


def decode_predictions(params: Params,
                       raw: Sequence[jnp.ndarray], *,
                       num_classes: int = 80,
                       rect_hw=None) -> jnp.ndarray:
    """Anchor decode -> [B, total_cells*3, 5+C] (xywh canvas px, obj, cls).

    ``rect_hw`` [B, 2] masks cells outside a rectangular-letterbox content
    region: the reference's LoadImages feeds the network only the
    stride-32-padded rect (detect_for_preprocess.py:55,66), so on our
    static square canvas the cells beyond it must not produce candidates
    (their objectness is zeroed)."""
    nc = num_classes
    anchors = params["detect"]["anchors"]
    outs = []
    for scale, (y, stride) in enumerate(zip(raw, YOLO_STRIDES)):
        b, h, w, _ = y.shape
        y = y.reshape(b, h, w, 3, 5 + nc)
        y = jax.nn.sigmoid(y)
        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        grid = jnp.stack([gx, gy], axis=-1)[None, :, :, None, :]
        xy = (y[..., :2] * 2.0 - 0.5 + grid) * stride
        wh = jnp.square(y[..., 2:4] * 2.0) * anchors[scale][None, None,
                                                            None, :, :]
        obj = y[..., 4:5]
        if rect_hw is not None:
            in_rect = ((gy * stride < rect_hw[:, None, None, 0]) &
                       (gx * stride < rect_hw[:, None, None, 1]))
            obj = obj * in_rect[..., None, None]
        out = jnp.concatenate([xy, wh, obj, y[..., 5:]], axis=-1)
        outs.append(out.reshape(b, h * w * 3, 5 + nc))
    return jnp.concatenate(outs, axis=1)


def decode_boxes_scores(params: Params, raw: Sequence[jnp.ndarray], *,
                        num_classes: int = 80, rect_hw=None):
    """Slim anchor decode for the NMS path: per-scale head outputs ->
    (boxes_xyxy [B,N,4], scores [B,N], classes [B,N] int32).

    Same math as ``decode_predictions`` but never materializes the
    [B, N, 5+C] tensor: the 85 head channels are read once and reduced to
    6 outputs per cell.  ``max(sigmoid(cls)) == sigmoid(max(cls_logit))``
    (sigmoid is monotone), so the per-class sigmoid never materializes
    either."""
    nc = num_classes
    anchors = params["detect"]["anchors"]
    bs, ss, cs = [], [], []
    for scale, (y, stride) in enumerate(zip(raw, YOLO_STRIDES)):
        b, h, w, _ = y.shape
        y = y.reshape(b, h, w, 3, 5 + nc)
        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        grid = jnp.stack([gx, gy], axis=-1)[None, :, :, None, :]
        xy = (jax.nn.sigmoid(y[..., :2]) * 2.0 - 0.5 + grid) * stride
        wh = jnp.square(jax.nn.sigmoid(y[..., 2:4]) * 2.0) \
            * anchors[scale][None, None, None, :, :]
        obj = jax.nn.sigmoid(y[..., 4])
        if rect_hw is not None:
            in_rect = ((gy * stride < rect_hw[:, None, None, 0]) &
                       (gx * stride < rect_hw[:, None, None, 1]))
            obj = obj * in_rect[..., None]
        cls_logits = y[..., 5:]
        cls_idx = jnp.argmax(cls_logits, axis=-1).astype(jnp.int32)
        score = obj * jax.nn.sigmoid(jnp.max(cls_logits, axis=-1))
        half = wh * 0.5
        boxes = jnp.concatenate([xy - half, xy + half], axis=-1)
        bs.append(boxes.reshape(b, h * w * 3, 4))
        ss.append(score.reshape(b, h * w * 3))
        cs.append(cls_idx.reshape(b, h * w * 3))
    return (jnp.concatenate(bs, axis=1), jnp.concatenate(ss, axis=1),
            jnp.concatenate(cs, axis=1))


@partial(jax.jit, static_argnames=("max_det", "conf_thres", "iou_thres",
                                   "num_classes", "focus_stem",
                                   "compute_dtype"))
def yolov5_detect(params: Params, images: jnp.ndarray, *,
                  conf_thres: float = 0.01, iou_thres: float = 0.45,
                  max_det: int = 36, num_classes: int = 80,
                  focus_stem: bool = False,
                  compute_dtype=jnp.float32,
                  rect_hw=None) -> Detections:
    """Batched detect: [B,S,S,3] in [0,1] -> Detections (leading dim B).

    Reference thresholds: conf 0.01 / iou 0.45
    (detect_for_preprocess.py:28-29).  ``rect_hw`` [B,2] enables the
    rectangular-letterbox cell mask (see decode_predictions)."""
    from .nms import nms_fixed
    raw = yolov5_raw(params, images, compute_dtype, focus_stem=focus_stem)
    boxes, scores, classes = decode_boxes_scores(
        params, raw, num_classes=num_classes, rect_hw=rect_hw)
    return jax.vmap(lambda bx, sc, cl: nms_fixed(
        bx, sc, cl, iou_thres=iou_thres, conf_thres=conf_thres,
        max_det=max_det))(boxes, scores, classes)


def stem_is_focus(params: Params) -> bool:
    """Static Focus-stem probe: v5.0 stems convolve 12 space-to-depth
    channels."""
    return params["b0"]["conv"].shape[2] == 12


# ---------------------------------------------------------------------------
# Torch weight import (ultralytics layer indices, see module docstring)
# ---------------------------------------------------------------------------

_LAYER_MAP = {  # our name -> ultralytics model.<i>
    "b0": 0, "b1": 1, "b2": 2, "b3": 3, "b4": 4, "b5": 5, "b6": 6,
    "b7": 7, "b8": 8, "b9": 9, "h10": 10, "h13": 13, "h14": 14,
    "h17": 17, "h18": 18, "h20": 20, "h21": 21, "h23": 23,
}
_DETECT_IDX = 24


def _np(v):
    return v.numpy() if hasattr(v, "numpy") else np.asarray(v)


def _fold_bn_sd(sd, pre):
    gamma = _np(sd[f"{pre}.weight"]).astype(np.float32)
    beta = _np(sd[f"{pre}.bias"]).astype(np.float32)
    mean = _np(sd[f"{pre}.running_mean"]).astype(np.float32)
    var = _np(sd[f"{pre}.running_var"]).astype(np.float32)
    scale = gamma / np.sqrt(var + BN_EPS)
    return {"scale": jnp.asarray(scale),
            "bias": jnp.asarray(beta - mean * scale)}


def _convbn_sd(sd, pre):
    w = _np(sd[f"{pre}.conv.weight"]).astype(np.float32)
    return {"conv": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bn": _fold_bn_sd(sd, f"{pre}.bn")}


def _c3_sd(sd, pre):
    out = {"cv1": _convbn_sd(sd, f"{pre}.cv1"),
           "cv2": _convbn_sd(sd, f"{pre}.cv2"),
           "cv3": _convbn_sd(sd, f"{pre}.cv3"), "m": []}
    i = 0
    while f"{pre}.m.{i}.cv1.conv.weight" in sd:
        out["m"].append({"cv1": _convbn_sd(sd, f"{pre}.m.{i}.cv1"),
                         "cv2": _convbn_sd(sd, f"{pre}.m.{i}.cv2")})
        i += 1
    return out


def import_torch_state_dict(sd: Dict[str, Any], *,
                            num_classes: int = 80) -> Params:
    """ultralytics DetectionModel state_dict -> our pytree.

    Accepts keys with or without a leading ``model.`` prefix; BN folded;
    Focus stem auto-detected (stem conv in-channels == 12).
    """
    sd = {k[6:] if k.startswith("model.") else k: v for k, v in sd.items()}
    stem_w = _np(sd["0.conv.conv.weight"] if "0.conv.conv.weight" in sd
                 else sd["0.conv.weight"])
    focus = "0.conv.conv.weight" in sd or stem_w.shape[1] == 12

    p: Params = {}
    for name, idx in _LAYER_MAP.items():
        pre = f"{idx}"
        if name == "b0" and focus:
            p[name] = _convbn_sd(sd, f"{pre}.conv")
        elif name == "b9":
            p[name] = {"cv1": _convbn_sd(sd, f"{pre}.cv1"),
                       "cv2": _convbn_sd(sd, f"{pre}.cv2")}
        elif name.startswith("b") and name not in ("b0", "b1", "b3", "b5",
                                                   "b7"):
            p[name] = _c3_sd(sd, pre)
        elif name in ("h13", "h17", "h20", "h23"):
            p[name] = _c3_sd(sd, pre)
        else:
            p[name] = _convbn_sd(sd, pre)

    convs = []
    for s in range(3):
        w = _np(sd[f"{_DETECT_IDX}.m.{s}.weight"]).astype(np.float32)
        b = _np(sd[f"{_DETECT_IDX}.m.{s}.bias"]).astype(np.float32)
        convs.append({"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                      "bias": jnp.asarray(b)})
    anchors_key = f"{_DETECT_IDX}.anchors"
    if anchors_key in sd:
        a = _np(sd[anchors_key]).astype(np.float32)
        anchors = jnp.asarray(a * np.asarray(YOLO_STRIDES,
                                             np.float32)[:, None, None])
    else:
        anchors = jnp.asarray(YOLO_ANCHORS)
    p["detect"] = {"convs": convs, "anchors": anchors}
    return p


def load_checkpoint(path: str, num_classes: int = 80) -> Params:
    """Load yolov5 weights from an ``.npz`` export or a torch state_dict
    file (a raw ultralytics ``.pt`` needs its repo to unpickle — convert it
    once with ``scripts/export_yolov5_npz.py``)."""
    if path.endswith(".npz"):
        return import_torch_state_dict(dict(np.load(path)),
                                       num_classes=num_classes)
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj:
        obj = obj["model"]
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    return import_torch_state_dict(
        {k: v.detach().cpu().float().numpy() for k, v in sd.items()},
        num_classes=num_classes)
