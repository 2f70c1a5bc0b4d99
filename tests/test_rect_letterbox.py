"""Rectangular-letterbox parity with the ultralytics geometry.

The reference's LoadImages letterboxes with ``auto=True`` — minimal
stride-32 padding on the short side (detect_for_preprocess.py:55,66 ->
yolov5 utils.datasets.letterbox) — while our static-shape canvas is a
full 640 square.  ``letterbox_params_rect`` must reproduce the
ultralytics scale/pad arithmetic exactly (oracle below is a line-for-line
numpy transcription of the 2020 ``letterbox`` function), and the detector
must not emit candidates from cells beyond the content rect.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_caption_tpu.vision.ops import letterbox_params_rect


def ultralytics_letterbox_geom(shape_hw, new_shape=640, stride=32):
    """yolov5-2020 utils.datasets.letterbox(auto=True, scaleup=True)
    geometry: returns (r, (nw, nh), top, bottom, left, right)."""
    h, w = shape_hw
    r = min(new_shape / h, new_shape / w)
    new_unpad = int(round(w * r)), int(round(h * r))        # (nw, nh)
    dw, dh = new_shape - new_unpad[0], new_shape - new_unpad[1]
    dw, dh = np.mod(dw, stride), np.mod(dh, stride)         # auto
    dw /= 2
    dh /= 2
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    return r, new_unpad, top, bottom, left, right


@pytest.mark.parametrize("hw", [(480, 640), (640, 480), (353, 500),
                                (640, 640), (427, 640), (1024, 768),
                                (333, 999), (100, 640)])
def test_rect_geometry_matches_ultralytics(hw):
    h, w = hw
    r, nh, nw, top, left, rect_h, rect_w = letterbox_params_rect(h, w, 640)
    ur, (unw, unh), utop, ubot, uleft, uright = \
        ultralytics_letterbox_geom(hw)
    assert r == ur
    assert (nw, nh) == (unw, unh)
    assert (top, left) == (utop, uleft)
    # the network-input shape ultralytics would produce
    assert rect_h == unh + utop + ubot
    assert rect_w == unw + uleft + uright
    assert rect_h % 32 == 0 or rect_h == unh + utop + ubot
    assert rect_h <= 640 and rect_w <= 640


def test_rect_mask_zeroes_out_of_rect_cells_per_stride():
    """Cell-level mask semantics at every stride: candidates from cells
    with ``gy*stride >= rect_h`` must score exactly 0 with the mask while
    the SAME cells score > 0 without it (sigmoid outputs are strictly
    positive under random weights), and in-rect cells are untouched.
    This fails if ``rect_hw`` masking is disabled — the r2 version only
    checked NMS-level box centers with a ±stride slack that unmasked
    cells at rows 4-6 also satisfied."""
    from image_caption_tpu.vision.yolov5 import (YOLO_STRIDES,
                                                 decode_boxes_scores,
                                                 init_yolov5, stem_is_focus,
                                                 yolov5_raw)

    params = init_yolov5(jax.random.PRNGKey(0), depth_multiple=0.33,
                         width_multiple=0.25)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    rect_h = 32.0
    rect = jnp.asarray([[rect_h, 64.0]] * 2)

    raw = yolov5_raw(params, imgs, jnp.float32,
                     focus_stem=stem_is_focus(params))
    _, s_masked, _ = decode_boxes_scores(params, raw, rect_hw=rect)
    _, s_full, _ = decode_boxes_scores(params, raw)
    s_masked, s_full = np.asarray(s_masked), np.asarray(s_full)

    off = 0
    for stride in YOLO_STRIDES:
        h = w = 64 // stride
        n = h * w * 3          # flat layout: ((gy*w)+gx)*3 + anchor
        sm = s_masked[:, off:off + n].reshape(2, h, w, 3)
        sf = s_full[:, off:off + n].reshape(2, h, w, 3)
        out_rows = np.arange(h) * stride >= rect_h
        assert out_rows.any() and (~out_rows).any(), stride
        assert np.all(sm[:, out_rows] == 0.0), stride
        assert np.all(sf[:, out_rows] > 0.0), stride   # fire without mask
        np.testing.assert_array_equal(sm[:, ~out_rows], sf[:, ~out_rows])
        off += n
    assert off == s_masked.shape[1]


def test_rect_mask_nms_smoke():
    """End-to-end detect with the mask still yields detections and never
    more than the unmasked run."""
    from image_caption_tpu.vision.yolov5 import init_yolov5, yolov5_detect

    params = init_yolov5(jax.random.PRNGKey(0), depth_multiple=0.33,
                         width_multiple=0.25)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    rect = jnp.asarray([[32.0, 64.0]] * 2)
    det = yolov5_detect(params, imgs, max_det=16, rect_hw=rect)
    det_full = yolov5_detect(params, imgs, max_det=16)
    valid = np.asarray(det.valid)
    assert np.asarray(det_full.valid).sum() >= valid.sum()
    assert valid.sum() > 0
