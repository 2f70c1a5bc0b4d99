"""Extraction-pipeline slot contract on tiny random backbones (CPU-fast).

Pins the reference's feature/position assembly semantics
(core/preprocess.py:91-138) after the dead-crop elimination: ResNet only
runs on slots that can carry a feature, and the ``max_obj`` cached-dataset
quirk keeps exactly TWO position rows (whole image + largest detection,
preprocess.py:105-123) with crops compacted into slots 1..max_obj in
area-descending order.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_caption_tpu.vision.pipeline import (ExtractorParams,
                                               extract_features_batch)


@pytest.fixture(scope="module")
def tiny_extractor():
    from image_caption_tpu.vision.resnet import init_resnet
    from image_caption_tpu.vision.yolov5 import init_yolov5
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    return ExtractorParams(
        yolo=init_yolov5(k1, depth_multiple=0.33, width_multiple=0.25),
        resnet=init_resnet(k2, stages=(1, 1, 1, 1)))


def _inputs(b=2, size=64, seed=0):
    rng = np.random.RandomState(seed)
    canvases = jnp.asarray(
        rng.rand(b, size, size, 3).astype(np.float32) * 255.0)
    metas = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (b, 1))
    sizes = jnp.tile(jnp.asarray([[float(size), float(size)]], jnp.float32),
                     (b, 1))
    return canvases, metas, sizes


def test_max_obj_two_position_rows_and_compaction(tiny_extractor):
    canvases, metas, sizes = _inputs()
    feats, poss, boxes = extract_features_batch(
        tiny_extractor, canvases, metas, sizes, num_objects=8, max_obj=3,
        crop_size=32, compute_dtype=jnp.float32)
    feats, poss = np.asarray(feats), np.asarray(poss)
    assert feats.shape == (2, 9, feats.shape[-1])
    assert poss.shape == (2, 9, 84)

    # row 0 = whole-image [0,0,1,1]+zeros; rows 2.. all zero
    np.testing.assert_array_equal(poss[:, 0, :4], [[0, 0, 1, 1]] * 2)
    assert np.all(poss[:, 0, 4:] == 0)
    assert np.all(poss[:, 2:] == 0)

    # features live only in slots 0..max_obj (compacted)
    assert np.all(feats[:, 4:] == 0)
    assert np.all(np.abs(feats[:, 0]).sum(-1) > 0)

    # row 1 = the largest-area kept detection's position row (when any
    # detection is valid its row must be nonzero)
    any_det = np.abs(feats[:, 1]).sum(-1) > 0
    row1_nonzero = np.abs(poss[:, 1]).sum(-1) > 0
    np.testing.assert_array_equal(any_det, row1_nonzero)


def test_cap_half_limits_feature_slots(tiny_extractor):
    canvases, metas, sizes = _inputs(seed=3)
    feats, poss, _ = extract_features_batch(
        tiny_extractor, canvases, metas, sizes, num_objects=8,
        cap_half=True, crop_size=32, compute_dtype=jnp.float32)
    feats, poss = np.asarray(feats), np.asarray(poss)
    # num_obj // 2 = 4 detector slots + whole image
    assert np.all(feats[:, 5:] == 0)
    assert np.all(poss[:, 5:] == 0)
    assert np.all(np.abs(feats[:, 0]).sum(-1) > 0)
    # feature slots and position rows agree about which slots are live
    live_f = np.abs(feats[:, 1:5]).sum(-1) > 0
    live_p = np.abs(poss[:, 1:5]).sum(-1) > 0
    np.testing.assert_array_equal(live_f, live_p)


def test_full_slots_when_uncapped(tiny_extractor):
    canvases, metas, sizes = _inputs(seed=5)
    feats, poss, _ = extract_features_batch(
        tiny_extractor, canvases, metas, sizes, num_objects=8,
        cap_half=False, crop_size=32, compute_dtype=jnp.float32)
    feats = np.asarray(feats)
    assert feats.shape[1] == 9
    # random-init detector at conf 0.01 fires plenty: all 8 slots live
    assert np.all(np.abs(feats[:, 1:]).sum(-1) > 0)


def test_sharded_extraction_matches_single_device(tiny_extractor):
    """Data-parallel extraction over the 8-device CPU mesh == the
    unsharded program (params replicated, batch sharded, no
    collectives)."""
    from image_caption_tpu.parallel import mesh as pmesh
    from image_caption_tpu.vision.pipeline import extract_features_sharded
    mesh = pmesh.make_mesh()
    canvases, metas, sizes = _inputs(b=8)
    kw = dict(num_objects=8, max_obj=3, crop_size=32,
              compute_dtype=jnp.float32)
    f0, p0, b0 = extract_features_batch(tiny_extractor, canvases, metas,
                                        sizes, **kw)
    f1, p1, b1 = extract_features_sharded(mesh, tiny_extractor, canvases,
                                          metas, sizes, **kw)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b0),
                               rtol=1e-5, atol=1e-5)


def test_sharded_extraction_rejects_indivisible_batch(tiny_extractor):
    from image_caption_tpu.parallel import mesh as pmesh
    from image_caption_tpu.vision.pipeline import extract_features_sharded
    mesh = pmesh.make_mesh()
    canvases, metas, sizes = _inputs(b=3)
    with pytest.raises(ValueError):
        extract_features_sharded(mesh, tiny_extractor, canvases, metas,
                                 sizes, num_objects=8, crop_size=32)


# ---------------------------------------------------------------------------
# Shared-trunk ROI feature mode (VERDICT r2 #2)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_roi_mode_contract_matches_crop_mode_structure(tiny_extractor,
                                                       dtype):
    """feature_mode='roi' produces the SAME positions/boxes/slot-validity
    as the per-crop mode (detection + selection are shared code); only the
    feature values differ (grid-pooled trunk vs per-crop encodings).
    Covers the default bfloat16 too: at full detect resolution the roi
    path must feed the detector the identical f32 canvas the crop path
    does (a bf16 /255 could flip NMS score ties)."""
    from image_caption_tpu.vision.pipeline import extract_features_roi
    canvases, metas, sizes = _inputs()
    kw = dict(num_objects=8, max_obj=3, compute_dtype=dtype)
    fc, pc, bc = extract_features_batch(
        tiny_extractor, canvases, metas, sizes, crop_size=32, **kw)
    fr, pr, br = extract_features_roi(
        tiny_extractor, canvases, metas, sizes, trunk_size=64,
        roi_bins=3, **kw)
    np.testing.assert_allclose(np.asarray(pr), np.asarray(pc),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(br), np.asarray(bc),
                               rtol=1e-5, atol=1e-5)
    fr, fc = np.asarray(fr), np.asarray(fc)
    assert fr.shape == fc.shape
    # live/dead slots agree exactly with the crop mode
    np.testing.assert_array_equal(np.abs(fr).sum(-1) > 0,
                                  np.abs(fc).sum(-1) > 0)
    assert np.all(np.isfinite(fr))


def test_roi_mode_identical_boxes_identical_features(tiny_extractor):
    """Two batch items with the same canvas must get the same roi
    features (pure function of trunk map + boxes)."""
    from image_caption_tpu.vision.pipeline import extract_features_roi
    canvases, metas, sizes = _inputs(b=1, seed=7)
    canvases = jnp.concatenate([canvases, canvases])
    metas = jnp.concatenate([metas, metas])
    sizes = jnp.concatenate([sizes, sizes])
    fr, pr, _ = extract_features_roi(
        tiny_extractor, canvases, metas, sizes, num_objects=8,
        cap_half=False, trunk_size=64, roi_bins=3,
        compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(fr[0]), np.asarray(fr[1]),
                               rtol=1e-5, atol=1e-5)


def test_roi_sharded_matches_single_device(tiny_extractor):
    from image_caption_tpu.parallel import mesh as pmesh
    from image_caption_tpu.vision.pipeline import (extract_features_roi,
                                                   extract_features_sharded)
    mesh = pmesh.make_mesh()
    canvases, metas, sizes = _inputs(b=8)
    kw = dict(num_objects=8, max_obj=3, trunk_size=64, roi_bins=3,
              compute_dtype=jnp.float32)
    f0, p0, _ = extract_features_roi(tiny_extractor, canvases, metas,
                                     sizes, **kw)
    f1, p1, _ = extract_features_sharded(mesh, tiny_extractor, canvases,
                                         metas, sizes, feature_mode="roi",
                                         **kw)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                               rtol=1e-5, atol=1e-5)


def test_roi_detect_size_boxes_stay_in_canvas_coords(tiny_extractor):
    """detect_size resizing: emitted boxes/positions must be in
    ORIGINAL-canvas coordinates (det.boxes are rescaled by 1/det_scale)
    and the pipeline contract holds."""
    from image_caption_tpu.vision.pipeline import extract_features_roi
    canvases, metas, sizes = _inputs(b=2, size=64, seed=9)
    fr, pr, br = extract_features_roi(
        tiny_extractor, canvases, metas, sizes, num_objects=8,
        cap_half=False, trunk_size=64, roi_bins=3, detect_size=32,
        compute_dtype=jnp.float32)
    br, pr = np.asarray(br), np.asarray(pr)
    # boxes back in 64-px canvas space (a 32-px detector emits boxes
    # within its own 32-px frame; /det_scale maps them to <= 64)
    live = np.abs(br).sum(-1) > 0
    assert live.any()
    assert br[live].max() <= 64.0 + 1e-3
    assert br[live].min() >= -1e-3
    # normalized position rows stay in [0, 1]
    assert pr[:, :, :4].max() <= 1.0 + 1e-5
    assert np.all(np.isfinite(np.asarray(fr)))
