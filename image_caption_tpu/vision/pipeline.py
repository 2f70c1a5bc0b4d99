"""Region-feature extraction pipeline: detector -> crops -> ResNet -> slots.

Replaces ``image_feature_YOLOv5`` / ``image_feature_FasterRCNN``
(``/root/reference/core/preprocess.py:91-221``) and ``get_boxes``
(``data/detect_for_preprocess.py:25-167``), which reload both backbone
checkpoints per image and run crops one at a time.  Here the whole
image -> [S, 2048] features + [S, P] positions contract is ONE jitted,
batched XLA program:

  letterbox [B,640,640,3] -> YOLOv5 detect (fixed-shape NMS)
    -> cap detections (num_obj//2 quirk, detect_for_preprocess.py:141-142)
    -> on-device crop+resize of every box AND the whole image to 224
    -> one ResNet-101 forward over [B*(1+K), 224, 224, 3]
    -> assemble zero-padded feature/position slots.

Fidelity quirks preserved behind flags:
  * ``cap_half``: keep only num_obj//2 detections (reference default);
  * ``max_obj``: keep the max_obj largest-area crops compacted into slots
    1..max_obj in area order, and keep exactly TWO position rows — the
    whole-image row and the largest detection's row
    (preprocess.py:105-123 — the cached-dataset configuration);
  * position rows = [x1/W, y1/H, x2/W, y2/H] + conf one-hot at the class
    index (detect_for_preprocess.py:134-138); whole-image row =
    [0,0,1,1] + zeros (preprocess.py:112-123).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .nms import Detections
from .ops import crop_and_resize, letterbox_image, unletterbox_boxes
from .resnet import (IMAGENET_MEAN, IMAGENET_STD, init_resnet,
                     resnet_features)
from .yolov5 import init_yolov5, yolov5_detect


class ExtractorParams(NamedTuple):
    yolo: Dict
    resnet: Dict


def init_extractor(seed: int = 0) -> ExtractorParams:
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return ExtractorParams(yolo=init_yolov5(k1), resnet=init_resnet(k2))


def load_extractor(weights_dir: Optional[str]) -> ExtractorParams:
    """Load yolov5x + resnet101 weights from ``weights_dir`` (npz/torch
    exports); random init when absent (shapes-only smoke mode)."""
    from .resnet import load_torch_checkpoint as load_resnet
    from .yolov5 import load_checkpoint as load_yolo
    if weights_dir:
        yolo_path = next((os.path.join(weights_dir, n)
                          for n in ("yolov5x.npz", "yolov5x.pt")
                          if os.path.exists(os.path.join(weights_dir, n))),
                         None)
        resnet_path = next((os.path.join(weights_dir, n)
                            for n in ("resnet101.npz", "resnet101.pth")
                            if os.path.exists(os.path.join(weights_dir, n))),
                           None)
        if yolo_path and resnet_path:
            return ExtractorParams(yolo=load_yolo(yolo_path),
                                   resnet=load_resnet(resnet_path))
        print(f"[vision] weights not found under {weights_dir!r}; "
              "using random-init backbones (smoke mode)")
    return init_extractor()


def _position_rows(boxes: jnp.ndarray, scores: jnp.ndarray,
                   classes: jnp.ndarray, valid: jnp.ndarray,
                   orig_w, orig_h, num_classes: int) -> jnp.ndarray:
    """[K,4] canvas-free xyxy (original px) -> [K, 4+num_classes] rows."""
    k = boxes.shape[0]
    norm = jnp.stack([boxes[:, 0] / orig_w, boxes[:, 1] / orig_h,
                      boxes[:, 2] / orig_w, boxes[:, 3] / orig_h], axis=-1)
    onehot = jax.nn.one_hot(classes, num_classes,
                            dtype=jnp.float32) * scores[:, None]
    rows = jnp.concatenate([norm, onehot], axis=-1)
    return rows * valid[:, None]


class _Selected(NamedTuple):
    """Shared detect+select state for the crop and roi feature modes."""
    det: Detections
    valid: jnp.ndarray           # [B, K] post-cap_half validity
    boxes_orig: jnp.ndarray      # [B, K, 4] original-pixel xyxy
    sel_valid: jnp.ndarray       # [B, M] validity of encoded slots 1..M
    sel_boxes: jnp.ndarray       # [B, M, 4] canvas-px boxes to encode
    full_box: jnp.ndarray        # [B, 4] whole content rect (canvas px)
    top_idx: Optional[jnp.ndarray]   # [B, max_obj] area order (max_obj)
    ow: jnp.ndarray
    oh: jnp.ndarray


def _detect_and_select(params: ExtractorParams, det_canvases, metas,
                       orig_sizes, *, num_objects: int, cap_half: bool,
                       max_obj: Optional[int], num_classes: int,
                       compute_dtype, det_scale: float = 1.0) -> _Selected:
    """YOLO detect + the reference's slot-selection quirks, shared by the
    per-crop and roi feature modes.

    ``det_canvases`` may be a RESIZED view of the letterbox canvas (the
    roi fast mode detects at ``detect_size``); ``det_scale`` =
    detect_size / canvas_size maps between the two spaces — metas stay in
    original-canvas coordinates and all returned boxes are rescaled back
    to them."""
    k = num_objects
    from .yolov5 import stem_is_focus
    rect_hw = metas[:, 3:5] * det_scale if metas.shape[1] >= 5 else None
    det: Detections = yolov5_detect(params.yolo, det_canvases / 255.0,
                                    max_det=k, num_classes=num_classes,
                                    focus_stem=stem_is_focus(params.yolo),
                                    compute_dtype=compute_dtype,
                                    rect_hw=rect_hw)
    if det_scale != 1.0:
        det = det._replace(boxes=det.boxes / det_scale)  # -> canvas px
    valid = det.valid
    if cap_half:
        # reference keeps only num_obj // 2 detections
        # (detect_for_preprocess.py:141-142)
        keep = jnp.arange(k)[None, :] < (num_objects // 2)
        valid = valid & keep

    oh = orig_sizes[:, 0].astype(jnp.float32)
    ow = orig_sizes[:, 1].astype(jnp.float32)
    boxes_orig = jax.vmap(unletterbox_boxes)(det.boxes, metas, oh, ow)

    # select which detections get encoded — the encoder (per-crop ResNet
    # or roi pooling) is the FLOP budget; slots that can never carry a
    # feature (beyond the cap_half prefix — NMS compacts kept boxes to the
    # front — or outside the max_obj top-area set) are never encoded
    if max_obj is not None:
        # the max_obj largest-area boxes, area-descending — the
        # reference sorts by area and keeps the first max_obj crops
        # COMPACTED into slots 1..max_obj (preprocess.py:105-110)
        area = (boxes_orig[..., 2] - boxes_orig[..., 0]) * \
               (boxes_orig[..., 3] - boxes_orig[..., 1])
        area = jnp.where(valid, area, -1.0)
        _, top_idx = jax.lax.top_k(area, max_obj)            # [B, M]
        sel_valid = jnp.take_along_axis(valid, top_idx, axis=1)
        sel_boxes = jnp.take_along_axis(
            det.boxes, top_idx[..., None], axis=1)           # canvas px
    else:
        n_det = num_objects // 2 if cap_half else num_objects
        top_idx = None
        sel_valid = valid[:, :n_det]
        sel_boxes = det.boxes[:, :n_det]

    r, top, left = metas[:, 0], metas[:, 1], metas[:, 2]
    full_box = jnp.stack([left, top, left + ow * r, top + oh * r], axis=-1)
    return _Selected(det=det, valid=valid, boxes_orig=boxes_orig,
                     sel_valid=sel_valid, sel_boxes=sel_boxes,
                     full_box=full_box, top_idx=top_idx, ow=ow, oh=oh)


def _assemble_outputs(sel: _Selected, feats_sel: jnp.ndarray, *,
                      num_objects: int, max_obj: Optional[int],
                      num_classes: int):
    """Zero-pad encoded features to S slots and build position rows
    (preprocess.py:112-134 contract, incl. the max_obj two-row quirk)."""
    b = feats_sel.shape[0]
    s = num_objects + 1
    m = feats_sel.shape[1] - 1           # encoded detection slots

    slot_valid = jnp.concatenate(
        [jnp.ones((b, 1), bool), sel.sel_valid], axis=1)  # [B, 1+M]
    feats_sel = feats_sel * slot_valid[..., None]
    feats = jnp.pad(feats_sel, ((0, 0), (0, s - (m + 1)), (0, 0)))

    pos_obj = jax.vmap(_position_rows, in_axes=(0, 0, 0, 0, 0, 0, None))(
        sel.boxes_orig, sel.det.scores, sel.det.classes, sel.valid,
        sel.ow, sel.oh, num_classes)
    full_row = jnp.concatenate(
        [jnp.asarray([0.0, 0.0, 1.0, 1.0]),
         jnp.zeros((num_classes,))])[None, None, :]

    if max_obj is not None:
        # cached-dataset quirk (preprocess.py:105-123): exactly TWO
        # position rows survive — the whole-image row and the
        # largest-area detection's row (``positions = [positions[0]]``
        # after the area sort, then the whole-image row is prepended)
        row1 = jnp.take_along_axis(
            pos_obj, sel.top_idx[:, :1, None], axis=1)       # [B,1,4+C]
        row1 = row1 * sel.sel_valid[:, :1, None]
        pos_tail = jnp.zeros((b, s - 2, 4 + num_classes))
        positions = jnp.concatenate(
            [jnp.broadcast_to(full_row, (b, 1, 4 + num_classes)),
             row1, pos_tail], axis=1)
    else:
        positions = jnp.concatenate(
            [jnp.broadcast_to(full_row, (b, 1, 4 + num_classes)), pos_obj],
            axis=1)

    # shape contract: S = num_objects + 1 slots (preprocess.py:125-134)
    return feats[:, :s], positions[:, :s], sel.boxes_orig


@partial(jax.jit,
         static_argnames=("num_objects", "cap_half", "max_obj",
                          "num_classes", "crop_size", "compute_dtype",
                          "use_pallas"))
def extract_features_batch(params: ExtractorParams,
                           canvases: jnp.ndarray,
                           metas: jnp.ndarray,
                           orig_sizes: jnp.ndarray, *,
                           num_objects: int = 36,
                           cap_half: bool = True,
                           max_obj: Optional[int] = None,
                           num_classes: int = 80,
                           crop_size: int = 224,
                           compute_dtype=jnp.bfloat16,
                           use_pallas: bool = False
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The whole per-crop pipeline for a batch (the parity default).

    canvases  [B, 640, 640, 3] float32 RGB 0..255 (letterboxed);
    metas     [B, 3] (scale, top, left) from ``letterbox_image``, or
              [B, 5] (scale, top, left, rect_h, rect_w) from the
              rectangular-letterbox loader — rect metas mask detector
              cells beyond the content rect (ultralytics auto-letterbox
              parity, detect_for_preprocess.py:55,66);
    orig_sizes[B, 2] (h, w) original pixels.
    Returns (features [B, S, 2048], positions [B, S, 4+C], xyxy [B, K, 4])
    with S = num_objects + 1.  ``compute_dtype`` defaults to bfloat16 —
    vision backbones are insensitive to it and the MXU runs 2x faster;
    pass float32 for bit-fidelity studies.
    """
    b = canvases.shape[0]
    sel = _detect_and_select(params, canvases, metas, orig_sizes,
                             num_objects=num_objects, cap_half=cap_half,
                             max_obj=max_obj, num_classes=num_classes,
                             compute_dtype=compute_dtype)

    # ---- crops: slot 0 = the whole letterboxed content region ----
    crop_boxes = jnp.concatenate([sel.full_box[:, None, :], sel.sel_boxes],
                                 axis=1)          # [B, 1+M, 4]
    m = crop_boxes.shape[1]

    # crop resample in the compute dtype: the resample is two dense
    # [224, 640]-weight matmuls per crop — bf16 halves their MXU cost and
    # pixel-value rounding (<=0.4% of 0..255) is far below the detector/
    # encoder noise floor.  f32 compute keeps an f32 resample.
    crops = jax.vmap(lambda im, bx: crop_and_resize(im, bx, crop_size)
                     )(canvases.astype(compute_dtype),
                       crop_boxes)                # [B, 1+M, S, S, 3]
    crops = ((crops.astype(jnp.float32) / 255.0 - IMAGENET_MEAN)
             / IMAGENET_STD)

    flat = crops.reshape(b * m, crop_size, crop_size, 3)
    feats_sel = resnet_features(params.resnet, flat,
                                compute_dtype=compute_dtype,
                                use_pallas=use_pallas
                                ).reshape(b, m, -1)
    return _assemble_outputs(sel, feats_sel, num_objects=num_objects,
                             max_obj=max_obj, num_classes=num_classes)


@partial(jax.jit,
         static_argnames=("num_objects", "cap_half", "max_obj",
                          "num_classes", "trunk_size", "roi_bins",
                          "detect_size", "compute_dtype"))
def extract_features_roi(params: ExtractorParams,
                         canvases: jnp.ndarray,
                         metas: jnp.ndarray,
                         orig_sizes: jnp.ndarray, *,
                         num_objects: int = 36,
                         cap_half: bool = True,
                         max_obj: Optional[int] = None,
                         num_classes: int = 80,
                         trunk_size: int = 448,
                         roi_bins: int = 7,
                         detect_size: Optional[int] = None,
                         compute_dtype=jnp.bfloat16
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shared-trunk fast extraction (opt-in ``feature_mode="roi"``).

    Instead of running ResNet-101 over every detection crop (the
    reference's recipe, core/preprocess.py:91-138: ~8 GF x crops per
    image), the canvas is encoded ONCE — ResNet-101 through stage 4 at
    ``trunk_size`` — and each slot's 2048-d feature is ROI-aligned +
    average-pooled from the stride-32 trunk map (the bottom-up-attention
    design the reference approximates by cropping).  Detection, slot
    selection, and position rows are IDENTICAL to the per-crop mode.

    ``detect_size``: run YOLOv5 on a resized view of the canvas (None =
    full canvas).  At B=128 bf16 the 640-canvas detector alone costs
    ~213 ms/batch (68% of its FLOPs bound) and dominates the whole
    pipeline; at 448 it is ~113 ms, and when ``detect_size ==
    trunk_size`` the resized canvas is shared with the trunk.  Detection
    at reduced resolution is part of this mode's documented fidelity
    trade (docs/parity.md).

    Fidelity caveat (docs/parity.md): features are grid-pooled trunk
    activations, not per-crop ResNet encodings — a captioner must be
    trained on the same feature mode it decodes with.  The per-crop mode
    stays the parity default.
    """
    b = canvases.shape[0]
    canvas_size = canvases.shape[1]
    detect_size = detect_size or canvas_size
    validate_feature_mode("roi", roi_trunk_size=trunk_size,
                          roi_detect_size=detect_size)

    def resized(size):
        if size == canvas_size:
            # pass the f32 canvas through unchanged: at full resolution
            # the detector input must be BIT-identical to the per-crop
            # mode's (which divides by 255 in f32 before the backbone
            # casts) — a bf16 /255 here could flip NMS score ties and
            # break the "detection/selection identical to crop mode"
            # contract (docs/parity.md).  Resized views have no crop-mode
            # twin; their compute_dtype resize is part of the documented
            # fidelity trade.
            return canvases
        return jax.image.resize(canvases.astype(compute_dtype),
                                (b, size, size, 3), method="bilinear")

    det_canvas = resized(detect_size)
    sel = _detect_and_select(params, det_canvas, metas, orig_sizes,
                             num_objects=num_objects, cap_half=cap_half,
                             max_obj=max_obj, num_classes=num_classes,
                             compute_dtype=compute_dtype,
                             det_scale=detect_size / canvas_size)

    # ---- one trunk forward over the (resized) canvas ----
    from .resnet import resnet_feature_maps
    x = det_canvas if trunk_size == detect_size else resized(trunk_size)
    x = ((x.astype(jnp.float32) / 255.0 - IMAGENET_MEAN)
         / IMAGENET_STD).astype(compute_dtype)
    c5 = resnet_feature_maps(params.resnet, x,
                             compute_dtype=compute_dtype)[-1]
    c5 = c5.astype(jnp.float32)        # [B, t/32, t/32, 2048]

    # ---- roi-align every slot box (slot 0 = whole content rect) ----
    roi_boxes = jnp.concatenate([sel.full_box[:, None, :], sel.sel_boxes],
                                axis=1)           # [B, 1+M, 4] canvas px
    fm_scale = (trunk_size / canvas_size) / 32.0  # canvas px -> map cells
    rois = jax.vmap(lambda fm, bx: crop_and_resize(
        fm, bx * fm_scale, roi_bins, method="linear"))(c5, roi_boxes)
    feats_sel = rois.mean(axis=(2, 3))            # [B, 1+M, 2048]
    return _assemble_outputs(sel, feats_sel, num_objects=num_objects,
                             max_obj=max_obj, num_classes=num_classes)


def replicate_extractor_params(mesh, params):
    """Broadcast extractor params over the mesh ONCE and reuse the copy
    (the shared identity cache in ``parallel.mesh.replicate_cached``).

    The ETL hot loop calls :func:`extract_features_sharded` per batch;
    without the cache every call would re-broadcast the full YOLOv5x +
    ResNet-101 pytree (hundreds of MB) and discard it."""
    from ..parallel import mesh as pmesh
    return pmesh.replicate_cached(mesh, params)


FEATURE_MODES = ("crop", "roi")


def validate_feature_mode(mode: str, image_model: str = "YOLOv5", *,
                          roi_trunk_size: Optional[int] = None,
                          roi_detect_size: Optional[int] = None) -> None:
    """Fail fast on unknown/unsupported feature modes — ``== "roi"``
    comparisons downstream would otherwise silently fall back to the
    per-crop path (e.g. a ``--set data.feature_mode=ROI`` typo).

    roi sizes must be multiples of YOLO's max stride (32): the anchor
    decode computes xy as ``(sigmoid+grid)*stride`` with the fixed
    8/16/32 stride table, and a non-multiple input makes the backbone's
    ceil-sized maps drift off those strides — every box would be
    silently offset/scaled wrong."""
    if mode not in FEATURE_MODES:
        raise ValueError(
            f"unknown feature_mode {mode!r}; expected one of "
            f"{FEATURE_MODES}")
    if mode == "roi" and image_model == "FasterRCNN":
        raise ValueError(
            "feature_mode='roi' is only implemented for the YOLOv5 "
            "pipeline; the FasterRCNN path already pools trunk features "
            "via its own ROI heads (vision/frcnn.py)")
    if mode == "roi":
        for name, v in (("roi_trunk_size", roi_trunk_size),
                        ("roi_detect_size", roi_detect_size)):
            if v is not None and (v <= 0 or v % 32):
                raise ValueError(
                    f"{name}={v} must be a positive multiple of 32 "
                    "(YOLOv5 max stride)")


def extract_features_sharded(mesh, params: ExtractorParams,
                             canvases: jnp.ndarray,
                             metas: jnp.ndarray,
                             orig_sizes: jnp.ndarray, *,
                             feature_mode: str = "crop",
                             **kwargs):
    """Data-parallel extraction over a device mesh (the 5k img/s north
    star is a v5e-8 figure — extraction scales embarrassingly over the
    ``data`` axis: params replicated, batch sharded, zero collectives).

    The batch dim must divide the ``data`` axis size.  Accepts the same
    keyword options as :func:`extract_features_batch` /
    :func:`extract_features_roi` (selected by ``feature_mode``)."""
    from ..parallel import mesh as pmesh
    validate_feature_mode(feature_mode,
                          roi_trunk_size=kwargs.get("trunk_size"),
                          roi_detect_size=kwargs.get("detect_size"))
    b = canvases.shape[0]
    ndata = mesh.shape[pmesh.DATA_AXIS]
    if b % ndata:
        raise ValueError(f"batch {b} not divisible by data axis {ndata}")
    ds = pmesh.data_sharding(mesh)
    params = replicate_extractor_params(mesh, params)
    canvases, metas, orig_sizes = (jax.device_put(x, ds) for x in
                                   (canvases, metas, orig_sizes))
    fn = extract_features_roi if feature_mode == "roi" \
        else extract_features_batch
    return fn(params, canvases, metas, orig_sizes, **kwargs)


# ---------------------------------------------------------------------------
# Faster R-CNN path (core/preprocess.py:141-221 contract)
# ---------------------------------------------------------------------------

class FrcnnExtractorParams(NamedTuple):
    frcnn: Dict
    resnet: Dict


def init_frcnn_extractor(seed: int = 0) -> FrcnnExtractorParams:
    from .frcnn import init_frcnn
    from .resnet import init_resnet
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return FrcnnExtractorParams(frcnn=init_frcnn(k1),
                                resnet=init_resnet(k2))


def load_frcnn_extractor(weights_dir: Optional[str]) -> FrcnnExtractorParams:
    from .frcnn import load_checkpoint as load_frcnn
    from .resnet import load_torch_checkpoint as load_resnet
    if weights_dir:
        f = next((os.path.join(weights_dir, n)
                  for n in ("fasterrcnn_resnet50_fpn.npz",
                            "fasterrcnn_resnet50_fpn.pth")
                  if os.path.exists(os.path.join(weights_dir, n))), None)
        r = next((os.path.join(weights_dir, n)
                  for n in ("resnet101.npz", "resnet101.pth")
                  if os.path.exists(os.path.join(weights_dir, n))), None)
        if f and r:
            return FrcnnExtractorParams(frcnn=load_frcnn(f),
                                        resnet=load_resnet(r))
        print(f"[vision] frcnn weights not found under {weights_dir!r}; "
              "using random-init backbones (smoke mode)")
    return init_frcnn_extractor()


@partial(jax.jit, static_argnames=("num_objects", "canvas", "crop_size"))
def extract_features_frcnn(params: FrcnnExtractorParams,
                           canvases: jnp.ndarray,
                           metas: jnp.ndarray,
                           orig_sizes: jnp.ndarray, *,
                           num_objects: int = 36,
                           canvas: int = 800, crop_size: int = 224
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """FRCNN batch pipeline -> reference contract
    (core/preprocess.py:141-221): positions = [y1/H, y2/H, x1/W, x2/W] +
    91-dim score one-hot at (label-1); slot 0 = whole image [0,0,1,1]+zeros;
    top ``num_objects`` detections, NOT halved."""
    from .frcnn import frcnn_detect_single

    b = canvases.shape[0]
    s = num_objects + 1
    norm = (canvases / 255.0 - IMAGENET_MEAN) / IMAGENET_STD

    det = jax.vmap(lambda im: frcnn_detect_single(
        params.frcnn, im, canvas=canvas, max_det=num_objects))(norm)

    oh = orig_sizes[:, 0].astype(jnp.float32)
    ow = orig_sizes[:, 1].astype(jnp.float32)
    boxes_orig = jax.vmap(unletterbox_boxes)(det.boxes, metas, oh, ow)

    # crops from the canvas (slot 0 = the letterboxed content region)
    r, top, left = metas[:, 0], metas[:, 1], metas[:, 2]
    full_box = jnp.stack([left, top, left + ow * r, top + oh * r], axis=-1)
    all_boxes = jnp.concatenate([full_box[:, None, :], det.boxes], axis=1)
    crops = jax.vmap(lambda im, bx: crop_and_resize(im, bx, crop_size)
                     )(canvases, all_boxes)
    crops = (crops / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    feats = resnet_features(
        params.resnet,
        crops.reshape(b * s, crop_size, crop_size, 3)).reshape(b, s, -1)

    slot_valid = jnp.concatenate([jnp.ones((b, 1), bool), det.valid], axis=1)
    feats = feats * slot_valid[..., None]

    def rows(bx, sc, lb, vd, h, w):
        norm4 = jnp.stack([bx[:, 1] / h, bx[:, 3] / h,
                           bx[:, 0] / w, bx[:, 2] / w], axis=-1)
        onehot = jax.nn.one_hot(lb - 1, 91, dtype=jnp.float32) * sc[:, None]
        return jnp.concatenate([norm4, onehot], axis=-1) * vd[:, None]

    pos_obj = jax.vmap(rows)(boxes_orig, det.scores, det.labels,
                             det.valid, oh, ow)
    full_row = jnp.concatenate([jnp.asarray([0.0, 0.0, 1.0, 1.0]),
                                jnp.zeros((91,))])[None, None, :]
    positions = jnp.concatenate(
        [jnp.broadcast_to(full_row, (b, 1, 95)), pos_obj], axis=1)
    return feats, positions, boxes_orig


# ---------------------------------------------------------------------------
# Host-side single-image helpers
# ---------------------------------------------------------------------------

def load_image_rgb(path: str) -> np.ndarray:
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.uint8)


_EXTRACTORS: Dict = {}


def extract_single_image(path: str, *, image_model: str = "YOLOv5",
                         num_objects: int = 36,
                         max_obj: Optional[int] = None,
                         weights_dir: Optional[str] = None,
                         rect: bool = False
                         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``MODEL.preprocess`` equivalent (core/models.py:70-78): one image ->
    (features [S,2048], positions [S,P], boxes_xyxy).  FasterRCNN routing
    shares the YOLO slot contract with 91-class rows.  ``rect`` selects
    the ultralytics rectangular letterbox (YOLO path only)."""
    if image_model not in ("YOLOv5", "FasterRCNN"):
        raise ValueError(image_model)

    if image_model == "FasterRCNN":
        key = ("frcnn", weights_dir or "_random")
        if key not in _EXTRACTORS:
            _EXTRACTORS[key] = load_frcnn_extractor(weights_dir)
        img = load_image_rgb(path).astype(np.float32)
        h, w = img.shape[:2]
        canvas, meta = letterbox_image(jnp.asarray(img), 800)
        feats, poss, boxes = extract_features_frcnn(
            _EXTRACTORS[key], canvas[None], meta[None],
            jnp.asarray([[h, w]], jnp.float32), num_objects=num_objects)
    else:
        key = ("yolo", weights_dir or "_random")
        if key not in _EXTRACTORS:
            _EXTRACTORS[key] = load_extractor(weights_dir)
        if rect:
            # load_letterboxed decodes once and returns (h, w) itself
            from .loader import load_letterboxed
            canvas_np, meta_np, hw = load_letterboxed(path, 640,
                                                       rect=True)
            canvas, meta = jnp.asarray(canvas_np), jnp.asarray(meta_np)
            h, w = float(hw[0]), float(hw[1])
        else:
            img = load_image_rgb(path).astype(np.float32)
            h, w = img.shape[:2]
            canvas, meta = letterbox_image(jnp.asarray(img), 640)
        feats, poss, boxes = extract_features_batch(
            _EXTRACTORS[key], canvas[None], meta[None],
            jnp.asarray([[h, w]], jnp.float32),
            num_objects=num_objects, max_obj=max_obj)
    return (np.asarray(feats[0]), np.asarray(poss[0]),
            np.asarray(boxes[0]))
