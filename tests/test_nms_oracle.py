"""NMS kept-set parity vs the ultralytics non_max_suppression algorithm.

VERDICT r1 #3 (offline part): neither real YOLOv5 weights, the ultralytics
repo, nor torchvision are available in this environment, so detector
parity is validated at the algorithm level — the exact candidate selection
+ suppression the reference invokes
(``/root/reference/data/detect_for_preprocess.py:78`` -> yolov5 2020
``utils.general.non_max_suppression`` -> ``torchvision.ops.nms``) is
transcribed below line-for-line (candidate gates, conf = obj*cls, class
offset 4096, greedy score-order suppression, max_det truncation), and our
fixed-shape ``yolo_postprocess`` / ``nms_fixed`` must keep the same
boxes/classes/scores in the same order.  The oracle is a deliberately
naive dynamic-shape sweep — structurally unlike the scan in vision/nms.py.

Candidate-rule note: ultralytics thresholds objectness first
(``xc = pred[..., 4] > conf``) and then the combined score
(``conf > conf_thres`` after ``cls *= obj``); since class probabilities
are sigmoids <= 1, ``obj*cls > t`` implies ``obj > t`` — the two-step rule
selects exactly our single-test candidate set.  These tests confirm that
equivalence empirically.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from image_caption_tpu.vision.nms import nms_fixed, yolo_postprocess


def _xywh2xyxy(x):
    y = x.copy()
    y[:, 0] = x[:, 0] - x[:, 2] / 2
    y[:, 1] = x[:, 1] - x[:, 3] / 2
    y[:, 2] = x[:, 0] + x[:, 2] / 2
    y[:, 3] = x[:, 1] + x[:, 3] / 2
    return y


def greedy_nms(boxes, scores, iou_thres):
    """torchvision.ops.nms semantics: greedy sweep in descending score
    order, suppressing IoU > threshold; returns kept indices in score
    order (csrc/ops/cpu/nms_kernel.cpp transcription)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(scores), bool)
    areas = np.clip(boxes[:, 2] - boxes[:, 0], 0, None) * \
        np.clip(boxes[:, 3] - boxes[:, 1], 0, None)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        lt = np.maximum(boxes[i, :2], boxes[:, :2])
        rb = np.minimum(boxes[i, 2:], boxes[:, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-9)
        suppressed |= iou > iou_thres
    return np.asarray(keep, np.int64)


def ultralytics_nms(pred_np, conf_thres=0.01, iou_thres=0.45, max_det=36,
                    agnostic=False):
    """yolov5-2020 non_max_suppression, single image, multi_label=False —
    the exact configuration the reference calls (classes=None,
    agnostic=None, detect_for_preprocess.py:78)."""
    x = np.asarray(pred_np, np.float32)
    x = x[x[:, 4] > conf_thres]                      # objectness gate
    if not x.shape[0]:
        return np.zeros((0, 6), np.float32)
    x = x.copy()
    x[:, 5:] *= x[:, 4:5]                            # conf = obj * cls
    box = _xywh2xyxy(x[:, :4])
    j = np.argmax(x[:, 5:], axis=1)
    conf = x[np.arange(len(x)), 5 + j]
    x = np.concatenate([box, conf[:, None], j[:, None].astype(np.float32)],
                       axis=1)[conf > conf_thres]
    if not x.shape[0]:
        return np.zeros((0, 6), np.float32)
    c = x[:, 5:6] * (0 if agnostic else 4096)        # class offset
    keep = greedy_nms(x[:, :4] + c, x[:, 4], iou_thres)
    return x[keep[:max_det]]


def _random_preds(rng, n=2000, hot=300, num_classes=80, canvas=640):
    """Raw head rows [N, 5+C]: xywh + obj + class sigmoids, with ~``hot``
    candidates above the 0.01 reference threshold."""
    cxy = rng.uniform(40, canvas - 40, size=(n, 2))
    wh = rng.uniform(8, 180, size=(n, 2))
    obj = rng.uniform(0, 0.004, size=n)
    hot_idx = rng.choice(n, size=hot, replace=False)
    obj[hot_idx] = rng.uniform(0.05, 1.0, size=hot)
    cls = rng.uniform(0.05, 1.0, size=(n, num_classes))
    return np.concatenate([cxy, wh, obj[:, None], cls],
                          axis=1).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("max_det", [36, 8])
def test_yolo_postprocess_matches_torchvision(seed, max_det):
    rng = np.random.RandomState(seed)
    pred = _random_preds(rng)

    det = yolo_postprocess(jnp.asarray(pred), num_classes=80,
                           iou_thres=0.45, conf_thres=0.01,
                           max_det=max_det, pre_nms=512)
    n_ours = int(np.sum(np.asarray(det.valid)))

    ref = ultralytics_nms(pred, conf_thres=0.01, iou_thres=0.45,
                          max_det=max_det)

    assert n_ours == len(ref)
    ours_boxes = np.asarray(det.boxes)[:n_ours]
    ours_scores = np.asarray(det.scores)[:n_ours]
    ours_classes = np.asarray(det.classes)[:n_ours]
    # torchvision returns keeps in score order — same as our pick order
    np.testing.assert_allclose(ours_boxes, ref[:, :4], rtol=1e-4,
                               atol=1e-3)
    np.testing.assert_allclose(ours_scores, ref[:, 4], rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_array_equal(ours_classes, ref[:, 5].astype(np.int32))


def test_nms_fixed_matches_batched_greedy_nms():
    """Direct nms_fixed vs class-aware greedy NMS (the
    torchvision.ops.batched_nms recipe: per-class box offset + plain
    nms)."""
    rng = np.random.RandomState(7)
    n = 400
    x1y1 = rng.uniform(0, 500, size=(n, 2))
    wh = rng.uniform(5, 120, size=(n, 2))
    boxes = np.concatenate([x1y1, x1y1 + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0.02, 1.0, size=n).astype(np.float32)
    classes = rng.randint(0, 5, size=n).astype(np.int32)

    det = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                    jnp.asarray(classes), iou_thres=0.5, conf_thres=0.01,
                    max_det=64, pre_nms=n)
    n_ours = int(np.sum(np.asarray(det.valid)))

    offset = classes.astype(np.float32)[:, None] * \
        (boxes.max() - boxes.min() + 1.0)
    keep = greedy_nms(boxes + offset, scores, 0.5)[:64]

    assert n_ours == len(keep)
    np.testing.assert_allclose(np.asarray(det.boxes)[:n_ours],
                               boxes[keep], rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(det.classes)[:n_ours],
                                  classes[keep])
