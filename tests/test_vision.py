"""Vision stack tests: ResNet parity vs torch, NMS truth table, crop/resize,
YOLO shape contract, end-to-end extraction pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_caption_tpu.vision import nms as N
from image_caption_tpu.vision import ops as O
from image_caption_tpu.vision import resnet as R


def test_bottleneck_matches_torch():
    """One bottleneck block vs torch.nn.functional ops (same weights)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    cin, width, cout, stride = 8, 4, 16, 2
    x = rng.randn(2, 9, 9, cin).astype(np.float32)

    p = {
        "conv1": rng.randn(1, 1, cin, width).astype(np.float32) * 0.1,
        "bn1": {"scale": rng.rand(width).astype(np.float32) + 0.5,
                "bias": rng.randn(width).astype(np.float32) * 0.1},
        "conv2": rng.randn(3, 3, width, width).astype(np.float32) * 0.1,
        "bn2": {"scale": rng.rand(width).astype(np.float32) + 0.5,
                "bias": rng.randn(width).astype(np.float32) * 0.1},
        "conv3": rng.randn(1, 1, width, cout).astype(np.float32) * 0.1,
        "bn3": {"scale": rng.rand(cout).astype(np.float32) + 0.5,
                "bias": rng.randn(cout).astype(np.float32) * 0.1},
        "downsample": {
            "conv": rng.randn(1, 1, cin, cout).astype(np.float32) * 0.1,
            "bn": {"scale": rng.rand(cout).astype(np.float32) + 0.5,
                   "bias": rng.randn(cout).astype(np.float32) * 0.1}},
    }
    p_jnp = jax.tree_util.tree_map(jnp.asarray, p)
    got = np.asarray(R._bottleneck(p_jnp, jnp.asarray(x), stride))

    # torch equivalent (NCHW)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    def conv(x, w, s, pad):
        wt = torch.from_numpy(np.ascontiguousarray(
            w.transpose(3, 2, 0, 1)))
        return F.conv2d(x, wt, stride=s, padding=pad)

    def bn(x, d):
        return x * torch.from_numpy(d["scale"])[None, :, None, None] + \
            torch.from_numpy(d["bias"])[None, :, None, None]

    out = F.relu(bn(conv(xt, p["conv1"], 1, 0), p["bn1"]))
    out = F.relu(bn(conv(out, p["conv2"], stride, 1), p["bn2"]))
    out = bn(conv(out, p["conv3"], 1, 0), p["bn3"])
    sc = bn(conv(xt, p["downsample"]["conv"], stride, 0),
            p["downsample"]["bn"])
    want = F.relu(out + sc).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_resnet_shapes_and_determinism():
    params = R.init_resnet(jax.random.PRNGKey(0), stages=(1, 1, 1, 1))
    imgs = jnp.asarray(np.random.RandomState(0).randn(
        2, 64, 64, 3).astype(np.float32))
    feats = R.resnet_features(params, imgs)
    assert feats.shape == (2, 2048)
    assert np.all(np.isfinite(np.asarray(feats)))


def test_resnet_torch_import_roundtrip():
    """A synthetic torchvision-style state_dict imports and the folded BN
    matches the torch inference formula on random data."""
    import torch
    rng = np.random.RandomState(1)
    sd = {}
    # stem
    sd["conv1.weight"] = rng.randn(64, 3, 7, 7).astype(np.float32) * 0.05
    for k, c in (("bn1", 64),):
        sd[f"{k}.weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{k}.bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{k}.running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{k}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    def add_block(pre, cin, width, cout, down):
        for name, (ci, co, k) in {
                "conv1": (cin, width, 1), "conv2": (width, width, 3),
                "conv3": (width, cout, 1)}.items():
            sd[f"{pre}.{name}.weight"] = rng.randn(
                co, ci, k, k).astype(np.float32) * 0.05
        for name, c in (("bn1", width), ("bn2", width), ("bn3", cout)):
            sd[f"{pre}.{name}.weight"] = rng.rand(c).astype(np.float32) + 0.5
            sd[f"{pre}.{name}.bias"] = rng.randn(c).astype(np.float32) * 0.1
            sd[f"{pre}.{name}.running_mean"] = rng.randn(c).astype(
                np.float32) * 0.1
            sd[f"{pre}.{name}.running_var"] = rng.rand(c).astype(
                np.float32) + 0.5
        if down:
            sd[f"{pre}.downsample.0.weight"] = rng.randn(
                cout, cin, 1, 1).astype(np.float32) * 0.05
            sd[f"{pre}.downsample.1.weight"] = rng.rand(cout).astype(
                np.float32) + 0.5
            sd[f"{pre}.downsample.1.bias"] = rng.randn(cout).astype(
                np.float32) * 0.1
            sd[f"{pre}.downsample.1.running_mean"] = rng.randn(cout).astype(
                np.float32) * 0.1
            sd[f"{pre}.downsample.1.running_var"] = rng.rand(cout).astype(
                np.float32) + 0.5

    stages = (1, 1, 1, 1)
    cin = 64
    for i in range(4):
        width = 64 * 2 ** i
        add_block(f"layer{i+1}.0", cin, width, width * 4, True)
        cin = width * 4

    params = R.import_torch_state_dict(sd, stages=stages)
    # folded BN == gamma/sqrt(var+eps), beta - mean*scale
    gamma = sd["bn1.weight"]
    var = sd["bn1.running_var"]
    scale = np.asarray(params["stem"]["bn"]["scale"])
    np.testing.assert_allclose(scale, gamma / np.sqrt(var + R.BN_EPS),
                               rtol=1e-6)
    feats = R.resnet_features(params, jnp.zeros((1, 32, 32, 3)))
    assert feats.shape == (1, 2048)


def test_crop_and_resize_identity():
    """Cropping the full image with out_size == image size is identity."""
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(16, 16, 3).astype(np.float32))
    out = O.crop_and_resize(img, jnp.asarray([[0.0, 0.0, 16.0, 16.0]]),
                            out_size=16, method="linear")
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(img),
                               atol=1e-5)


def test_crop_and_resize_quadrant():
    """Cropping a constant-color quadrant returns that color."""
    img = np.zeros((8, 8, 3), np.float32)
    img[:4, :4] = 1.0
    out = O.crop_and_resize(jnp.asarray(img),
                            jnp.asarray([[0.0, 0.0, 4.0, 4.0]]),
                            out_size=4, method="linear")
    np.testing.assert_allclose(np.asarray(out[0]), 1.0, atol=1e-5)


def test_letterbox_roundtrip():
    img = jnp.asarray(np.random.RandomState(0).rand(30, 60, 3) * 255)
    canvas, meta = O.letterbox_image(img, 64)
    assert canvas.shape == (64, 64, 3)
    # a canvas-space box mapping back to original pixels
    boxes = jnp.asarray([[float(meta[2]), float(meta[1]),
                          float(meta[2]) + 60 * float(meta[0]),
                          float(meta[1]) + 30 * float(meta[0])]])
    back = O.unletterbox_boxes(boxes, meta, 30, 60)
    np.testing.assert_allclose(np.asarray(back[0]), [0, 0, 60, 30],
                               atol=0.6)


def test_nms_suppression_truth_table():
    boxes = jnp.asarray([
        [0, 0, 10, 10],       # A
        [1, 1, 11, 11],       # overlaps A heavily -> suppressed
        [20, 20, 30, 30],     # disjoint -> kept
        [0, 0, 10, 10],       # same as A but other class -> kept
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    classes = jnp.asarray([0, 0, 0, 1], jnp.int32)
    det = N.nms_fixed(boxes, scores, classes, iou_thres=0.45,
                      conf_thres=0.01, max_det=4, pre_nms=4)
    got = np.asarray(det.valid)
    assert got.sum() == 3
    kept_scores = sorted(np.asarray(det.scores)[got].tolist(), reverse=True)
    np.testing.assert_allclose(kept_scores, [0.9, 0.7, 0.6], atol=1e-6)


def test_nms_conf_threshold():
    boxes = jnp.asarray([[0, 0, 5, 5], [10, 10, 15, 15]], jnp.float32)
    det = N.nms_fixed(boxes, jnp.asarray([0.5, 0.005]),
                      jnp.asarray([0, 0], jnp.int32),
                      conf_thres=0.01, max_det=2, pre_nms=2)
    assert np.asarray(det.valid).tolist() == [True, False]


@pytest.mark.slow
def test_yolov5_tiny_shapes():
    """A down-scaled yolov5 (depth 0.33 width 0.25) produces the right
    head shapes and detections contract."""
    from image_caption_tpu.vision import yolov5 as Y
    params = Y.init_yolov5(jax.random.PRNGKey(0), depth_multiple=0.33,
                           width_multiple=0.25)
    imgs = jnp.asarray(np.random.RandomState(0).rand(
        1, 128, 128, 3).astype(np.float32))
    raw = Y.yolov5_raw(params, imgs)
    assert [tuple(r.shape) for r in raw] == [
        (1, 16, 16, 255), (1, 8, 8, 255), (1, 4, 4, 255)]
    det = Y.yolov5_detect(params, imgs, max_det=10)
    assert det.boxes.shape == (1, 10, 4)
    assert det.valid.dtype == bool


def test_slim_decode_matches_full_decode():
    """decode_boxes_scores (the NMS-path decode that never materializes
    [B,N,85]) == decode_predictions reduced to boxes/score/class."""
    from image_caption_tpu.vision import nms as N
    from image_caption_tpu.vision import yolov5 as Y
    params = Y.init_yolov5(jax.random.PRNGKey(0), depth_multiple=0.33,
                           width_multiple=0.25)
    rng = np.random.RandomState(1)
    raw = [jnp.asarray(rng.randn(2, s, s, 255).astype(np.float32) * 2)
           for s in (16, 8, 4)]
    rect = jnp.asarray([[128.0, 96.0], [64.0, 128.0]])

    full = Y.decode_predictions(params, raw, num_classes=80, rect_hw=rect)
    fb = N.xywh_to_xyxy(full[..., :4])
    fs = full[..., 4] * jnp.max(full[..., 5:], axis=-1)
    fc = jnp.argmax(full[..., 5:], axis=-1)
    sb, ss, sc = Y.decode_boxes_scores(params, raw, num_classes=80,
                                       rect_hw=rect)
    np.testing.assert_allclose(np.asarray(sb), np.asarray(fb), atol=1e-3)
    np.testing.assert_allclose(np.asarray(ss), np.asarray(fs), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(sc), np.asarray(fc))


def test_nms_scan_full_matches_nms_fixed():
    """Full-set greedy scan == pre-top-k greedy scan when the candidate
    count is within the old pre_nms cap."""
    from image_caption_tpu.vision import nms as N
    rng = np.random.RandomState(2)
    n = 300
    xy = rng.uniform(0, 600, (n, 2))
    wh = rng.uniform(10, 120, (n, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
    scores = jnp.asarray(rng.rand(n).astype(np.float32))
    classes = jnp.asarray(rng.randint(0, 5, n).astype(np.int32))
    a = N.nms_fixed(boxes, scores, classes, max_det=20, pre_nms=512)
    b = N.nms_scan_full(boxes, scores, classes, max_det=20)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_allclose(np.asarray(a.boxes), np.asarray(b.boxes))
    np.testing.assert_array_equal(np.asarray(a.classes),
                                  np.asarray(b.classes))


def test_s2d_stem_matches_direct_conv():
    """The space-to-depth stem (3x3/s1 over [H/2,W/2,12]) is numerically
    the direct 6x6/s2/pad-2 stem conv — same MACs, rearranged."""
    from image_caption_tpu.vision import yolov5 as Y
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(6, 6, 3, 16).astype(np.float32))
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    direct = Y._conv(x, w, 2, 6)
    s2d = jax.lax.conv_general_dilated(
        Y._space_to_depth2(x), Y._stem_s2d_kernel(w), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(s2d), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)
    # and through the full stem block (bn + silu), both stem modes agree
    params = Y.init_yolov5(jax.random.PRNGKey(0), depth_multiple=0.33,
                           width_multiple=0.25)
    a = Y.yolov5_raw(params, x, s2d_stem=False)
    b = Y.yolov5_raw(params, x, s2d_stem=True)
    for ra, rb in zip(a, b):
        np.testing.assert_allclose(np.asarray(rb), np.asarray(ra),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_extraction_pipeline_contract():
    """Random-weights end-to-end extraction keeps the reference shape
    contract: [S,2048] features with whole-image slot 0, [S,84] positions
    with row 0 = [0,0,1,1,...]."""
    from image_caption_tpu.vision import pipeline as P
    from image_caption_tpu.vision import yolov5 as Y

    params = P.ExtractorParams(
        yolo=Y.init_yolov5(jax.random.PRNGKey(0), depth_multiple=0.33,
                           width_multiple=0.25),
        resnet=R.init_resnet(jax.random.PRNGKey(1), stages=(1, 1, 1, 1)))

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(96, 128, 3).astype(np.float32) * 255)
    canvas, meta = O.letterbox_image(img, 128)
    feats, poss, boxes = P.extract_features_batch(
        params, canvas[None], meta[None],
        jnp.asarray([[96, 128]], jnp.float32),
        num_objects=8, crop_size=64)
    assert feats.shape == (1, 9, 2048)
    assert poss.shape == (1, 9, 84)
    np.testing.assert_allclose(np.asarray(poss)[0, 0, :4], [0, 0, 1, 1])
    assert np.all(np.asarray(poss)[0, 0, 4:] == 0)
    assert np.all(np.isfinite(np.asarray(feats)))
