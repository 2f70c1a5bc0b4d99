"""Faster R-CNN graph tests: anchors/decode vs torchvision math, RPN and
full-detector contracts, pipeline output format."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_caption_tpu.vision import frcnn as F


def test_level_anchors_match_torchvision_formula():
    a = F._level_anchors(2, 3, stride=4, size=32)
    assert a.shape == (2 * 3 * 3, 4)
    # first cell, ratio 0.5: w = 32/sqrt(0.5), h = 32*sqrt(0.5), centered 0
    w = 32 / math.sqrt(0.5)
    h = 32 * math.sqrt(0.5)
    np.testing.assert_allclose(a[0], [-w / 2, -h / 2, w / 2, h / 2],
                               rtol=1e-6)
    # second cell along x shifts by stride
    np.testing.assert_allclose(a[3] - a[0], [4, 0, 4, 0], atol=1e-6)


def test_decode_deltas_identity_and_shift():
    anchors = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    zero = jnp.zeros((1, 4))
    np.testing.assert_allclose(np.asarray(F.decode_deltas(anchors, zero)),
                               [[0, 0, 10, 10]], atol=1e-5)
    # dx = 1 (weighted 10) shifts center by width: wx=10 -> dx/10 * w = 1
    shift = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
    got = np.asarray(F.decode_deltas(anchors, shift))[0]
    np.testing.assert_allclose(got, [10, 0, 20, 10], atol=1e-4)


def test_decode_deltas_match_torchvision():
    torch = pytest.importorskip("torch")
    from collections import namedtuple
    rng = np.random.RandomState(0)
    anchors = np.abs(rng.rand(5, 4)).astype(np.float32) * 50
    anchors[:, 2:] += anchors[:, :2] + 5
    deltas = (rng.randn(5, 4) * 0.3).astype(np.float32)

    got = np.asarray(F.decode_deltas(jnp.asarray(anchors),
                                     jnp.asarray(deltas)))

    # torchvision BoxCoder formula, restated
    wx, wy, ww, wh = F.BBOX_REG_WEIGHTS
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = anchors[:, 0] + aw / 2
    ay = anchors[:, 1] + ah / 2
    dx, dy, dw, dh = deltas[:, 0] / wx, deltas[:, 1] / wy, \
        deltas[:, 2] / ww, deltas[:, 3] / wh
    cx, cy = dx * aw + ax, dy * ah + ay
    w, h = np.exp(dw) * aw, np.exp(dh) * ah
    want = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.fixture(scope="module")
def tiny_frcnn():
    """Random-weight frcnn with a resnet shrunk to 1-block stages."""
    params = F.init_frcnn(jax.random.PRNGKey(0))
    from image_caption_tpu.vision.resnet import init_resnet
    params["backbone"] = init_resnet(jax.random.PRNGKey(1),
                                     stages=(1, 1, 1, 1))
    return params


@pytest.mark.slow
def test_frcnn_detect_contract(tiny_frcnn):
    img = jnp.asarray(np.random.RandomState(0).randn(
        256, 256, 3).astype(np.float32))
    det = F.frcnn_detect_single(tiny_frcnn, img, canvas=256, max_det=8,
                                num_proposals=32)
    assert det.boxes.shape == (8, 4)
    assert det.labels.dtype == jnp.int32
    assert np.all(np.asarray(det.boxes) >= 0)
    assert np.all(np.asarray(det.boxes) <= 256)


@pytest.mark.slow
def test_frcnn_pipeline_contract(tiny_frcnn):
    from image_caption_tpu.vision.ops import letterbox_image
    from image_caption_tpu.vision.pipeline import (FrcnnExtractorParams,
                                                   extract_features_frcnn)
    from image_caption_tpu.vision.resnet import init_resnet

    params = FrcnnExtractorParams(
        frcnn=tiny_frcnn,
        resnet=init_resnet(jax.random.PRNGKey(2), stages=(1, 1, 1, 1)))
    img = jnp.asarray(np.random.RandomState(0).rand(
        100, 160, 3).astype(np.float32) * 255)
    canvas, meta = letterbox_image(img, 256)
    feats, poss, boxes = extract_features_frcnn(
        params, canvas[None], meta[None],
        jnp.asarray([[100, 160]], jnp.float32),
        num_objects=6, canvas=256, crop_size=64)
    assert feats.shape == (1, 7, 2048)
    assert poss.shape == (1, 7, 95)
    np.testing.assert_allclose(np.asarray(poss)[0, 0, :4], [0, 0, 1, 1])
